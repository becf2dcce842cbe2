"""Typed training configuration — drop-in compatible with the reference's
``config/config.json`` (all 46 keys, semantics per `config/README.md:4-56`)."""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import List, Optional


@dataclass
class TrainConfig:
    # data organization (`config/README.md:7-11`)
    model_dir: str = "models"
    log_dir: str = "logs"
    bool_sub_dir: bool = False
    sub_dir: str = "train_ex"
    # label-map generation (`config/README.md:14-26`)
    gen_label_only: bool = False
    gen_label: bool = True
    save_label: bool = True
    label_dir: str = "labels"
    zero_borders_maps: bool = False
    zero_borders_maps_val: bool = False
    zero_bord_scale: int = 8
    zero_bord_frac: float = 0.5
    in_shape: List[int] = field(default_factory=lambda: [160, 160, 192])
    num_labels: int = 26
    num_maps: int = 100
    im_scales: List[float] = field(default_factory=lambda: [16, 32, 64])
    def_scales: List[float] = field(default_factory=lambda: [8, 16, 32])
    im_max_std: float = 1.0
    def_max_std: float = 3.0
    add_str: str = "26lab_"
    # grayscale image generation (`config/README.md:29-35`)
    same_subj: bool = True
    blur_std: float = 1.0
    gamma: float = 0.25
    vel_std: float = 3.0
    # Scalar or list. The reference's two-step recipe (`README.md:157`)
    # trains the smooth step-1 model with vel_res [32, 64] (noise summed
    # over both Perlin scales) and the fine step-2 model with 16.
    vel_res: float | List[float] = 16.0
    bias_std: float = 0.3
    bias_res: float = 40.0
    # training (`config/README.md:38-49`)
    gpu: str = "0"
    epochs: int = 600
    batch_size: int = 1
    train_frac: float = 0.8
    batch_size_val: int = 1
    save_freq: int = 100
    bool_init_weights: bool = False
    init_weights: str = "model.h5"
    reg_param: float = 1.0
    lr: float = 1e-4
    init_epoch: int = 0
    verbose: int = 1
    # network architecture (`config/README.md:52-56`)
    int_steps: int = 5
    int_res: int = 2
    svf_res: int = 2
    enc: List[int] = field(default_factory=lambda: [64, 64, 64, 64])
    dec: List[int] = field(default_factory=lambda: [64, 64, 64, 64, 64, 64])
    # TPU-native extensions (not in the reference config; safe defaults)
    seed: int = 42
    compute_dtype: str = "bfloat16"
    num_devices: Optional[int] = None  # None = all
    # global-norm gradient clipping; 0 disables (reference has none, but the
    # Dice objective can diverge at lr >= 1e-3 — measured)
    grad_clip_norm: float = 0.0
    # gather-payload dtype for the composed-field warp in the loss ("" = f32).
    # bf16 halves the packed-source bytes, which admits a 16-voxel slab halo
    # at the training shape (f32 only fits halo 8 — generator fields reach
    # ~10 voxels and would hit the whole-volume fallback gather); field
    # deviation < 0.03 voxels, same policy as integrate_payload_dtype.
    compose_payload_dtype: str = "bfloat16"
    # resolution divisor for the generator+model field composition in the
    # loss. 2 = compose the generator's small-grid field with the model's
    # int-res warp at that SMALL grid and upsample the result once (replaces
    # the full-res compose, 64.5 + 74.9 ms at 160x160x192 — PERF.md round 3);
    # falls back to full-res automatically when the two reduced grids differ.
    # 1 = always compose at full resolution (strict reference parity;
    # deviation between the two is second-order, bounded in test_train.py).
    compose_res: int = 2
    # integration-grid divisor for the GENERATOR's augmentation SVF
    # (synth/image_engine.py). The scaling-and-squaring while-loop over the
    # generator fields is the single largest synthesis block (76.7 ms/step
    # at 160x160x192 — train_profile round 3d); the fields are smooth at
    # vel_res (~16 voxel) scale, so integrating at /4 instead of /2 is 1/8
    # the gather work. The /4 field is a DIFFERENT but equally valid
    # diffeomorphic augmentation (deviation vs /2 up to ~0.9 voxel on the
    # strongest draws; detJ statistics match to 3 decimals, 0 foldings —
    # PERF.md round 3d) and the loss target composes the SAME field the
    # images were warped by, so the objective stays self-consistent.
    # Default 4: measured step 478.8 -> 406.1 ms, and a 3k-step head-to-head
    # from scratch (benchmarks/svf4_learn_results.json) shows held-out Dice
    # tracking the /2 arm at every eval point (0.8405 vs 0.8394 at 3k).
    # 2 = the round-1/2 half-res integration (strict-comparison value).
    svf_int_res: int = 4
    # resolution divisor for the smoothness (Grad-L2) regularizer. 2 =
    # penalize the model's int-res warp directly instead of its full-res
    # upsample: for the exact 2x interleave rescale the fine-grid forward
    # differences EQUAL the coarse-grid ones (vectors scale by 2, grid by
    # 1/2), so the two losses differ only in boundary terms — measured
    # ratio 1.056 +- 0.001 on smooth fields, i.e. a fixed ~5% rescale of
    # reg_param. With the Dice term using the bridged compose, this DCEs
    # the model's full-res flow rescale (and its VJP) out of the train
    # step entirely. 1 = reference semantics (Grad on the full-res flow,
    # train_synthmorph.py:307).
    grad_res: int = 1

    @classmethod
    def from_json(cls, path: str) -> "TrainConfig":
        with open(path) as f:
            data = json.load(f)
        return cls.from_dict(data)

    @classmethod
    def from_dict(cls, data: dict) -> "TrainConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        unknown = set(data) - known
        if unknown:
            raise ValueError(f"unknown config keys: {sorted(unknown)}")
        return cls(**data)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)
