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
    # Multi-chip inference layout: {"data": N, "space": M} — batch axis over
    # `data`, volume X-axis over `space` (the TPU-native upgrade of the
    # reference's subvolume tiling, config_inference.json:2-4 / SURVEY §2.3).
    # Empty dict = single-chip. Values must multiply to <= available devices.
    sharding: dict = field(default_factory=dict)
    # Two-step cascade: resolution of the final field composition.
    # 'full' (default): upsample both step fields and compose on the image
    # grid — ~5x less worst-case folding in the exported field (PERF.md
    # round 4; the composition is sampled where the evaluator differentiates
    # it). 'int' reproduces the reference exactly: compose at the model's
    # int-res grid, upsample the composed field
    # (`bids_two_steps_registration.py:324` + `:515`).
    cascade_compose_res: str = "full"
    # Inference-time SVF smoothing (voxels at the SVF grid, 0 = off, applied
    # to every model this config builds) and a cascade-specific override for
    # the step-1 model only (None = inherit svf_smooth_sigma). The cascade's
    # smooth model is where exported-field folding originates on
    # large-displacement subjects (benchmarks/cascade_smoothing_sweep.py).
    # Step-1 default 3.0: on the 3-subject displaced artifact it cuts
    # worst-subject composed-field folding 2.99% -> 0.21% AND raises mean
    # SC-Dice 0.9029 -> 0.9083 (benchmarks/twostep_parity_artifact.json,
    # 4-arm run) — closer to the reference's diffeomorphic target
    # (eval_reg_with_jacobian.py:76-78) than its own raw compose semantics.
    # Set 0.0 (or null in JSON) for raw reference behavior.
    svf_smooth_sigma: float = 0.0
    model1_svf_smooth_sigma: float | None = 3.0
    # int8 quantized inference ("" / null = off): wide U-Net convs run
    # int8 x int8 -> int32 on the MXU (2x bf16 peak) with activation scales
    # calibrated on the first predicted pair (or a sidecar via
    # models/quantize.py). TPU-native opt-in; the reference is f32 TF-CPU.
    quantize: str = ""

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
        cfg = cls(**data)
        if cfg.svf_smooth_sigma is None:  # JSON null = off (docs say so)
            cfg.svf_smooth_sigma = 0.0
        bad = set(cfg.sharding) - {"data", "space"}
        if bad:
            raise ValueError(f"unknown sharding keys: {sorted(bad)} (want data/space)")
        for k, v in cfg.sharding.items():
            if v is not None and (not isinstance(v, int) or isinstance(v, bool)
                                  or v < 1):
                raise ValueError(
                    f"sharding.{k} must be a positive integer (number of "
                    f"chips), got {v!r}"
                )
        if cfg.quantize is None:
            cfg.quantize = ""
        if cfg.quantize not in ("", "int8"):
            raise ValueError(
                f"unknown quantize mode {cfg.quantize!r}: supported values are "
                "\"int8\" (wide convs on the int8 MXU path, models/quantize.py) "
                "or \"\"/null (full precision)"
            )
        return cfg

    def round16(self, x: int, axis: int | None = None) -> int:
        """Round a dim to the model's shape quantum (16, floor by default —
        `bids_registration.py:157-158` parity).

        When ``space`` sharding is configured and ``axis`` is 0 (the sharded
        X dimension), the quantum becomes ``16 * space`` so preprocessed
        shapes always divide over the mesh — opting into sharding opts into
        the coarser X rounding (Y/Z keep reference-parity rounding)."""
        q = 16
        if axis == 0:
            q *= max(1, int(self.sharding.get("space", 1) or 1))
        if self.round_mode == "ceil16":
            return int(-(-int(x) // q) * q)
        return int((int(x) // q) * q)
