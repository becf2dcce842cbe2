#!/usr/bin/env python
"""BIDS two-step cascade registration CLI
(reference parity: `bids_two_steps_registration.py`)."""

if __name__ == "__main__":
    # one-cpu pinning must precede the inference import chain (which touches
    # jax) so XLA_FLAGS is set before any backend client exists.
    from multimodal_registration_tpu.onecpu import apply_one_cpu_env

    apply_one_cpu_env()

    from multimodal_registration_tpu.infer.cli import bids_two_steps

    bids_two_steps()
