#!/usr/bin/env python
"""SC-seg overlap evaluator CLI (reference parity: `eval_reg_on_sc_seg.py`)."""

import sys

from multimodal_registration_tpu.evalx.cli import eval_on_sc_seg

if __name__ == "__main__":
    sys.exit(eval_on_sc_seg())
