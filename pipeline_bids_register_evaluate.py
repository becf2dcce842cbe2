#!/usr/bin/env python
"""BIDS batch pipeline CLI (reference parity: `pipeline_bids_register_evaluate.sh`
+ `sct_run_batch`; use --opt-affine for the opt_affine variant and
--model2-path for the two-step variant)."""

from multimodal_registration_tpu.pipeline.batch import main

if __name__ == "__main__":
    main()
