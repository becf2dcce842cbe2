"""Head-to-head learning check: svf_int_res 2 vs 4 (quarter-grid generator).

The /4 generator integration saves 72 ms/step at the reference workload
(train_breakdown --svf4: 478.8 -> 406.1 ms), but it changes the augmentation
FIELD DISTRIBUTION (deviation vs /2 up to ~0.9 voxel on the strongest draws,
detJ statistics equal — PERF.md round 3d). Unit tests bound the compose-path
math; only training can show whether the coarser integration grid harms the
objective. This probe trains two models from scratch with IDENTICAL seeds,
map banks, and step schedules — one with svf_int_res=2 (production default),
one with 4 — and evaluates both on the SAME fixed held-out pairs built with
the default (/2) engine, so the eval distribution is independent of the
training-time flag.

Decision rule (PERF.md): flip the default only if the /4 run's held-out Dice
tracks the /2 run within noise at every eval point.

Usage: svf4_learn_probe.py [steps] [--small]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from multimodal_registration_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import os

import jax

if os.environ.get("MMREG_FORCE_CPU", "0") == "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from multimodal_registration_tpu.evalx.nmi import normalized_mutual_information
from multimodal_registration_tpu.ops.warp import warp
from multimodal_registration_tpu.synth.image_engine import labels_to_image
from multimodal_registration_tpu.synth.labelmaps import generate_label_maps
from multimodal_registration_tpu.train.config import TrainConfig
from multimodal_registration_tpu.train.trainer import Trainer, engine_config_from


def _mean_label_dice(a_lab, b_lab, num_labels):
    ds = []
    for l in range(1, num_labels):
        ta, tb = a_lab == l, b_lab == l
        denom = ta.sum() + tb.sum()
        if denom == 0:
            continue
        ds.append(2.0 * np.logical_and(ta, tb).sum() / denom)
    return float(np.mean(ds)) if ds else 1.0


def main(steps=3000, small=False, eval_every=1000):
    shape = (32, 32, 32) if small else (96, 96, 96)
    L = 4 if small else 16
    base = dict(
        in_shape=list(shape), num_labels=L, num_maps=16,
        im_scales=[8, 16, 32] if not small else [8, 16],
        def_scales=[8, 16] if not small else [8],
        batch_size=1, lr=1e-4, grad_clip_norm=1.0, epochs=1, same_subj=True,
    )

    # shared map bank + held-out pairs from the DEFAULT (/2) engine so the
    # eval distribution is the same for both arms
    maps = generate_label_maps(
        jax.random.PRNGKey(0), base["num_maps"], shape, L,
        im_scales=base["im_scales"], def_scales=base["def_scales"],
    )
    eval_cfg = engine_config_from(
        TrainConfig.from_dict(dict(base, svf_int_res=2)))
    assert eval_cfg.svf_int_res == 2

    def make_pair(seed):
        k1, k2 = jax.random.split(jax.random.PRNGKey(1000 + seed))
        lab = jnp.asarray(maps[seed % len(maps)])
        img1, oh1 = labels_to_image(k1, lab, eval_cfg)
        img2, oh2 = labels_to_image(k2, lab, eval_cfg)
        return (np.asarray(img1), np.asarray(jnp.argmax(oh1, -1)),
                np.asarray(img2), np.asarray(jnp.argmax(oh2, -1)))

    pairs = [make_pair(s) for s in range(3)]
    base_dice = float(np.mean([
        _mean_label_dice(fx_lab, mov_lab, L) for _, mov_lab, _, fx_lab in pairs
    ]))
    base_nmi = float(np.mean([
        normalized_mutual_information(fx, mov) for mov, _, fx, _ in pairs
    ]))
    out = {"workload": f"{shape} / {L} labels", "steps": steps,
           "identity": {"dice": round(base_dice, 4), "nmi": round(base_nmi, 4)},
           "arms": {}}
    print(json.dumps({"identity": out["identity"]}), flush=True)

    for r in (2, 4):
        cfg = TrainConfig.from_dict(dict(base, svf_int_res=r))
        trainer = Trainer(cfg)
        params, opt_state = trainer.init_state()
        bank = trainer.put_bank(np.stack(maps).astype(np.uint8))
        rng = np.random.default_rng(0)
        key = jax.random.PRNGKey(1)

        @jax.jit
        def infer(params, mov, fx, mov_lab, _t=trainer):
            o = _t.model.apply(params, mov[None, ..., None], fx[None, ..., None])
            flow = o["flow_fullres"][0]
            moved = o["moved"][0, ..., 0]
            moved_lab = warp(mov_lab.astype(jnp.float32), flow, interp="nearest")
            return moved, moved_lab

        def evaluate(params):
            nmis, dices = [], []
            for mov_img, mov_lab, fx_img, fx_lab in pairs:
                moved, moved_lab = infer(params, jnp.asarray(mov_img),
                                         jnp.asarray(fx_img), jnp.asarray(mov_lab))
                nmis.append(normalized_mutual_information(fx_img, np.asarray(moved)))
                dices.append(_mean_label_dice(fx_lab, np.asarray(moved_lab), L))
            return round(float(np.mean(nmis)), 4), round(float(np.mean(dices)), 4)

        traj = []
        t0 = time.time()
        for step in range(1, steps + 1):
            idx = rng.integers(len(maps), size=1)
            si, ti = trainer.put_indices(idx, idx)
            key, sub = jax.random.split(key)
            params, opt_state, aux = trainer.train_step_banked(
                params, opt_state, sub, bank, si, ti)
            if step % eval_every == 0 or step == steps:
                nmi, dice = evaluate(params)
                traj.append({"step": step, "loss": round(float(aux["loss"]), 4),
                             "nmi": nmi, "dice": dice,
                             "sec_per_step": round((time.time() - t0) / step, 3)})
                print(json.dumps({"arm": r, **traj[-1]}), flush=True)
        out["arms"][str(r)] = traj

    print(json.dumps(out))


if __name__ == "__main__":
    argv = list(sys.argv[1:])
    small = "--small" in argv
    if small:
        argv.remove("--small")
    main(int(argv[0]) if argv else 3000,
         small=small, eval_every=200 if small else 1000)
