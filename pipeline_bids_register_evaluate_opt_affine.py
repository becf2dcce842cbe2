#!/usr/bin/env python
"""Opt-affine BIDS pipeline CLI (reference parity:
`pipeline_bids_register_evaluate_opt_affine.sh` — the SC-Dice-gated
center-of-mass affine fallback is enabled by default here)."""

import sys

from multimodal_registration_tpu.pipeline.batch import main

if __name__ == "__main__":
    main(sys.argv[1:] + ["--opt-affine"])
