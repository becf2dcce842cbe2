#!/usr/bin/env python
"""Jacobian evaluator CLI (reference parity: `eval_reg_with_jacobian.py`)."""

import sys

from multimodal_registration_tpu.evalx.cli import eval_with_jacobian

if __name__ == "__main__":
    sys.exit(eval_with_jacobian())
