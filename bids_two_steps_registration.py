#!/usr/bin/env python
"""BIDS two-step cascade registration CLI
(reference parity: `bids_two_steps_registration.py`)."""

from multimodal_registration_tpu.infer.cli import bids_two_steps

if __name__ == "__main__":
    bids_two_steps()
