#!/usr/bin/env python
"""SynthMorph training CLI (reference parity: `train_synthmorph.py`)."""

from multimodal_registration_tpu.train.cli import main

if __name__ == "__main__":
    main()
