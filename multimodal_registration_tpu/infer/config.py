"""Inference configuration — drop-in compatible with the reference's
``config/config_inference.json`` (10 keys, `config/README.md:59-75`)."""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import List


@dataclass
class InferenceConfig:
    use_subvol: bool = False
    subvol_size: List[int] = field(default_factory=lambda: [80, 80, 96])
    min_perc_overlap: float = 0.1
    int_steps: int = 5
    int_res: int = 2
    svf_res: int = 2
    enc: List[int] = field(default_factory=lambda: [256, 256, 256, 256])
    dec: List[int] = field(default_factory=lambda: [256, 256, 256, 256, 256, 256])
    warp_interpolation: str = "linear"
    resample_interpolation: str = "linear"
    # TPU-native extensions
    compute_dtype: str = "bfloat16"
    # `floor16` reproduces the reference's shape quirk
    # (int(ceil(x // 16)) * 16 floors instead of ceiling, bids_registration.py:158);
    # `ceil16` is the "intended" behavior.
    round_mode: str = "floor16"

    @classmethod
    def from_json(cls, path: str) -> "InferenceConfig":
        with open(path) as f:
            return cls.from_dict(json.load(f))

    @classmethod
    def from_dict(cls, data: dict) -> "InferenceConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        unknown = set(data) - known
        if unknown:
            raise ValueError(f"unknown inference config keys: {sorted(unknown)}")
        return cls(**data)

    def round16(self, x: int) -> int:
        if self.round_mode == "ceil16":
            return int(-(-int(x) // 16) * 16)
        return int((int(x) // 16) * 16)
