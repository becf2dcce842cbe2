"""multimodal_registration_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of the
ivadomed/multimodal-registration framework (SynthMorph-style contrast-agnostic
deformable registration for spinal-cord multimodal MRI).

Design: pure-functional device code (jit/pjit + Pallas kernels) with a thin host
layer for NIfTI/BIDS I/O. Every capability of the reference repo — training with
on-device SynthMorph synthesis, single/two-step inference, subvolume tiling,
evaluation (Dice/NMI/Jacobian), BIDS batch pipelines — is provided natively.

Reference parity notes are cited as ``file:line`` against /root/reference.
"""

__version__ = "0.2.0"


def __getattr__(name):
    # Lazy `ops` so that importing jax-free helpers (e.g. ``onecpu``, which
    # must run BEFORE any jax backend initialization) doesn't pull in jax.
    if name == "ops":
        import importlib

        return importlib.import_module("multimodal_registration_tpu.ops")
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
