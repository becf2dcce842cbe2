"""multimodal_registration_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of the
ivadomed/multimodal-registration framework (SynthMorph-style contrast-agnostic
deformable registration for spinal-cord multimodal MRI).

Design: pure-functional device code (jit/pjit + Pallas kernels) with a thin host
layer for NIfTI/BIDS I/O. Every capability of the reference repo — training with
on-device SynthMorph synthesis, single/two-step inference, subvolume tiling,
evaluation (Dice/NMI/Jacobian), BIDS batch pipelines — is provided natively.

Reference parity notes are cited as ``file:line`` against /root/reference.
"""

__version__ = "0.1.0"

from multimodal_registration_tpu import ops  # noqa: F401
