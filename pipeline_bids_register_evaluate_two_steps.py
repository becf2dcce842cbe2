#!/usr/bin/env python
"""Two-step BIDS pipeline CLI (reference parity:
`pipeline_bids_register_evaluate_two_steps.sh` — pass --model-path for the
smooth/"affine-like" model and --model2-path for the fine deformable model)."""

from multimodal_registration_tpu.pipeline.batch import main

if __name__ == "__main__":
    main()
