#!/usr/bin/env python
"""NMI evaluator CLI (reference parity: `eval_reg_with_mi.py`)."""

import sys

from multimodal_registration_tpu.evalx.cli import eval_with_mi

if __name__ == "__main__":
    sys.exit(eval_with_mi())
