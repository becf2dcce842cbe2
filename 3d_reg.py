#!/usr/bin/env python
"""Standalone pair-registration CLI (reference parity: `3d_reg.py`).

Fixes the reference's `3d_reg.py:421` NameError (undefined fx_contrast)."""

from multimodal_registration_tpu.infer.cli import pair_registration

if __name__ == "__main__":
    pair_registration()
