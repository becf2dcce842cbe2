"""Quality gate for int8 quantized inference on the TRAINED published
architecture (enc [256]x4 / dec [256]x6, `config/config_inference.json:8-9`).

Evaluates the 12k-step w256 checkpoint
(`benchmarks/learned_w256_160x160x192_26lab.npz`, held-out Dice 0.9327 in
`learn_w256_results.json`) on the SAME held-out pairs as the training
trajectory (same map/pair seeds, same historical eval-engine pins), in two
arms:

  bf16 — the production forward (reproduces the trajectory's 0.9327)
  int8 — `quantize="int8"` with scales calibrated on the first eval pair
         (the Registrar's lazy-calibration semantics, models/quantize.py)

plus field agreement diagnostics (max/mean |flow_bf16 - flow_int8|).

Adoption gate (PERF.md round 4f): int8 held-out Dice within 0.005 of bf16 and
NMI within 0.002 — quantization noise must be invisible at the metric level,
not merely small. Writes ``quantize_quality_results.json``.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from multimodal_registration_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_registration_tpu.evalx.nmi import normalized_mutual_information
from multimodal_registration_tpu.models.quantize import calibrate_scales
from multimodal_registration_tpu.models.vxm_dense import VxmConfig, VxmDense
from multimodal_registration_tpu.synth.image_engine import labels_to_image
from multimodal_registration_tpu.synth.labelmaps import generate_label_maps
from multimodal_registration_tpu.train.config import TrainConfig
from multimodal_registration_tpu.train.trainer import Trainer
from benchmarks.learn_ref_workload import SHAPE, NUM_LABELS, mean_label_dice

HERE = os.path.dirname(os.path.abspath(__file__))
CKPT = os.path.join(HERE, "learned_w256_160x160x192_26lab.npz")
RESULTS = os.path.join(HERE, "quantize_quality_results.json")
WIDTH = 256


def main(n_pairs: int = 3):
    cfg = TrainConfig.from_dict(
        dict(
            in_shape=list(SHAPE), num_labels=NUM_LABELS, num_maps=40,
            batch_size=1, lr=1e-4, grad_clip_norm=1.0, epochs=1,
            same_subj=True, enc=[WIDTH] * 4, dec=[WIDTH] * 6,
        )
    )
    trainer = Trainer(cfg)
    params, _, _ = trainer.load_checkpoint(CKPT)
    print(f"loaded {CKPT}", flush=True)

    # identical map + held-out pair seeds as learn_ref_workload.py (so the
    # bf16 arm must reproduce the committed trajectory's final Dice)
    maps = generate_label_maps(
        jax.random.PRNGKey(0), cfg.num_maps, SHAPE, NUM_LABELS,
        im_scales=cfg.im_scales, def_scales=cfg.def_scales,
    )
    eval_cfg = dataclasses.replace(trainer.engine_cfg, svf_int_res=2)

    def make_pair(seed):
        k1, k2 = jax.random.split(jax.random.PRNGKey(5000 + seed))
        lab = jnp.asarray(maps[seed % len(maps)])
        img1, oh1 = labels_to_image(k1, lab, eval_cfg)
        img2, oh2 = labels_to_image(k2, lab, eval_cfg)
        return (np.asarray(img1), np.asarray(jnp.argmax(oh1, -1)),
                np.asarray(img2), np.asarray(jnp.argmax(oh2, -1)))

    os.environ["MMREG_BLUR_MODE"] = "convolve"
    pairs = [make_pair(s) for s in range(n_pairs)]
    os.environ.pop("MMREG_BLUR_MODE", None)

    base = VxmConfig(enc=(WIDTH,) * 4, dec=(WIDTH,) * 6)
    arms = {
        "bf16": (base, None),
        "int8": (dataclasses.replace(base, quantize="int8"), "calibrate"),
    }

    from multimodal_registration_tpu.ops.warp import warp

    result = {"checkpoint": os.path.basename(CKPT), "workload": f"{SHAPE} / {NUM_LABELS} labels",
              "arms": {}}
    flows = {}
    for name, (vcfg, calib) in arms.items():
        model = VxmDense(cfg=vcfg)
        variables = params
        if calib:
            mov0, _, fx0, _ = pairs[0]
            quant = calibrate_scales(
                vcfg, params,
                [(jnp.asarray(mov0)[None, ..., None], jnp.asarray(fx0)[None, ..., None])],
            )
            variables = {**params, "quant": quant}
            print(f"{name}: calibrated {len(jax.tree_util.tree_leaves(quant))} scales",
                  flush=True)

        @jax.jit
        def infer(variables, mov, fx, mov_lab, model=model):
            out = model.apply(variables, mov[None, ..., None], fx[None, ..., None])
            flow = out["flow_fullres"][0]
            moved = out["moved"][0, ..., 0]
            moved_lab = warp(mov_lab.astype(jnp.float32), flow, interp="nearest")
            return moved, moved_lab, flow

        nmis, dices = [], []
        arm_flows = []
        for mov_img, mov_lab, fx_img, fx_lab in pairs:
            moved, moved_lab, flow = infer(
                variables, jnp.asarray(mov_img), jnp.asarray(fx_img),
                jnp.asarray(mov_lab))
            nmis.append(normalized_mutual_information(fx_img, np.asarray(moved)))
            dices.append(mean_label_dice(fx_lab, np.asarray(moved_lab), NUM_LABELS))
            arm_flows.append(np.asarray(flow))
        flows[name] = arm_flows
        result["arms"][name] = {
            "dice": round(float(np.mean(dices)), 4),
            "nmi": round(float(np.mean(nmis)), 4),
            "per_pair_dice": [round(float(d), 4) for d in dices],
        }
        print(f"{name}: dice {result['arms'][name]['dice']} "
              f"nmi {result['arms'][name]['nmi']}", flush=True)

    diffs = [np.abs(a - b) for a, b in zip(flows["bf16"], flows["int8"])]
    result["flow_agreement_vox"] = {
        "max": round(float(max(d.max() for d in diffs)), 4),
        "mean": round(float(np.mean([d.mean() for d in diffs])), 5),
    }
    d_gap = result["arms"]["bf16"]["dice"] - result["arms"]["int8"]["dice"]
    n_gap = result["arms"]["bf16"]["nmi"] - result["arms"]["int8"]["nmi"]
    result["gate"] = {
        "dice_gap": round(float(d_gap), 4),
        "nmi_gap": round(float(n_gap), 4),
        "pass": bool(d_gap <= 0.005 and n_gap <= 0.002),
    }
    with open(RESULTS, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
