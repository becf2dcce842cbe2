#!/usr/bin/env python
"""Deformation-field generator CLI (reference parity: `gen_apply_def_field.py`)."""

from multimodal_registration_tpu.infer.cli import gen_apply_def_field

if __name__ == "__main__":
    gen_apply_def_field()
