#!/usr/bin/env python
"""Standalone pair-registration CLI (reference parity: `3d_reg.py`).

Fixes the reference's `3d_reg.py:421` NameError (undefined fx_contrast)."""

if __name__ == "__main__":
    # one-cpu pinning must precede the inference import chain (which touches
    # jax) so XLA_FLAGS is set before any backend client exists.
    from multimodal_registration_tpu.onecpu import apply_one_cpu_env

    apply_one_cpu_env()

    from multimodal_registration_tpu.infer.cli import pair_registration

    pair_registration()
