#!/usr/bin/env python
"""BIDS single-model registration CLI (reference parity: `bids_registration.py`)."""

from multimodal_registration_tpu.infer.cli import bids_registration

if __name__ == "__main__":
    bids_registration()
