"""Hardware training of the two-step pipeline's STEP-1 (smooth) model.

The reference's two-step approach uses two models trained with different
deformation statistics: the first registers data deformed with a SMOOTH
field — "setting the `vel_res` parameter ... to `[32, 64]` for the first
model and to `16` for the second model" (`/root/reference/README.md:157`) —
so it acts like a learned rigid/affine stage for largely-displaced volumes,
while the fine 50k-step flagship (`learned_ref_160x160x192_26lab.npz`)
plays the step-2 role.

Same workload as ``learn_ref_workload.py`` (160x160x192, 26 labels,
`config/config.json:14-16,29-31`), with ``vel_res=[32, 64]``. Held-out
evaluation covers BOTH regimes every ``eval_every`` steps:

  * ``smooth``: same-subject pairs deformed by the smooth generator
    (in-distribution for this model), and
  * ``affine``: same-subject pairs where the moving volume is additionally
    displaced by a LARGE random rigid transform (translation up to ~12 vox +
    rotation up to ~6 deg) — the "volumes initially in different affine
    spaces" setting the two-step pipeline targets.

Results: ``learn_model1_results.json``; checkpoint:
``learned_model1_160x160x192_26lab.npz``.

Usage: python benchmarks/learn_model1_workload.py [steps] [warm_start_npz]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from multimodal_registration_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_registration_tpu.evalx.nmi import normalized_mutual_information
from multimodal_registration_tpu.synth.image_engine import labels_to_image
from multimodal_registration_tpu.synth.labelmaps import generate_label_maps
from multimodal_registration_tpu.train.config import TrainConfig
from multimodal_registration_tpu.train.trainer import Trainer

from learn_ref_workload import mean_label_dice  # noqa: E402  (same dir)

HERE = os.path.dirname(os.path.abspath(__file__))
SHAPE = (160, 160, 192)
NUM_LABELS = 26
RESULTS = os.path.join(HERE, "learn_model1_results.json")
CKPT = os.path.join(HERE, "learned_model1_160x160x192_26lab.npz")


def rigid_displace(img, lab, seed):
    """Host-side large rigid displacement of a (vol, labels) pair — the
    held-out 'affine regime' probe. scipy affine_transform maps OUTPUT
    coords through the matrix, which is exactly the moving-volume
    resampling an acquisition-space mismatch produces."""
    from scipy import ndimage

    rng = np.random.default_rng(seed)
    ang = np.deg2rad(rng.uniform(-6, 6))
    axis = rng.integers(3)
    rot = np.eye(3)
    i, j = [a for a in range(3) if a != axis]
    rot[i, i] = rot[j, j] = np.cos(ang)
    rot[i, j], rot[j, i] = -np.sin(ang), np.sin(ang)
    shift = rng.uniform(-12, 12, size=3)
    center = (np.asarray(img.shape) - 1) / 2.0
    offset = center - rot @ center + shift
    mov = ndimage.affine_transform(img, rot, offset=offset, order=1)
    mov_lab = ndimage.affine_transform(lab, rot, offset=offset, order=0)
    return mov.astype(np.float32), mov_lab


def main(steps: int = 12000, warm: str | None = None):
    cfg = TrainConfig.from_dict(dict(
        in_shape=list(SHAPE),
        num_labels=NUM_LABELS,
        num_maps=40,
        batch_size=1,
        lr=1e-4,
        grad_clip_norm=1.0,
        epochs=1,
        same_subj=True,
        vel_res=[32, 64],  # the smooth step-1 recipe (`README.md:157`)
    ))
    trainer = Trainer(cfg)
    params, opt_state = trainer.init_state()
    warm_loaded = bool(warm and os.path.exists(warm))
    if warm_loaded:
        params, _, _ = trainer.load_checkpoint(warm)
        opt_state = jax.device_put(trainer.optimizer.init(params), trainer._repl)
        print(f"warm-started from {warm}", flush=True)

    print("generating label maps...", flush=True)
    maps = generate_label_maps(
        jax.random.PRNGKey(0), cfg.num_maps, SHAPE, NUM_LABELS,
        im_scales=cfg.im_scales, def_scales=cfg.def_scales,
    )
    bank = trainer.put_bank(np.stack(maps).astype(np.uint8))

    # held-out pairs pinned to svf_int_res=2 (as in learn_ref_workload.py)
    # but with THIS model's smooth vel_res. NOTE: unlike learn_ref_workload,
    # the blur stays at the current default (shifts) — this file's trajectory
    # is internally consistent, but its absolute Dice/NMI are not exactly
    # engine-identical to learn_ref_results.json's convolve-pinned evals.
    import dataclasses as _dc

    eval_cfg = _dc.replace(trainer.engine_cfg, svf_int_res=2)

    def make_pair(seed):
        k1, k2 = jax.random.split(jax.random.PRNGKey(7000 + seed))
        lab = jnp.asarray(maps[seed % len(maps)])
        img1, oh1 = labels_to_image(k1, lab, eval_cfg)
        img2, oh2 = labels_to_image(k2, lab, eval_cfg)
        return (np.asarray(img1), np.asarray(jnp.argmax(oh1, -1)),
                np.asarray(img2), np.asarray(jnp.argmax(oh2, -1)))

    pairs = [make_pair(s) for s in range(3)]
    # affine regime: same pairs, moving half additionally rigid-displaced
    pairs_affine = []
    for s, (mov, mov_lab, fx, fx_lab) in enumerate(pairs):
        amov, amov_lab = rigid_displace(mov, mov_lab, 100 + s)
        pairs_affine.append((amov, amov_lab, fx, fx_lab))

    @jax.jit
    def infer(params, mov, fx, mov_lab):
        from multimodal_registration_tpu.ops.warp import warp

        out = trainer.model.apply(params, mov[None, ..., None], fx[None, ..., None])
        flow = out["flow_fullres"][0]
        moved = out["moved"][0, ..., 0]
        moved_lab = warp(mov_lab.astype(jnp.float32), flow, interp="nearest")
        return moved, moved_lab, jnp.mean(jnp.abs(flow))

    def evaluate(params, which):
        nmis, dices, flows = [], [], []
        for mov_img, mov_lab, fx_img, fx_lab in which:
            moved, moved_lab, mf = infer(
                params, jnp.asarray(mov_img), jnp.asarray(fx_img), jnp.asarray(mov_lab))
            nmis.append(normalized_mutual_information(fx_img, np.asarray(moved)))
            dices.append(mean_label_dice(fx_lab, np.asarray(moved_lab), NUM_LABELS))
            flows.append(float(mf))
        return (round(float(np.mean(nmis)), 4), round(float(np.mean(dices)), 4),
                round(float(np.mean(flows)), 3))

    step_base = 0
    if warm_loaded and warm == CKPT and os.path.exists(RESULTS):
        with open(RESULTS) as f:
            log = json.load(f)
        log["warm_start"] = warm
        if log["trajectory"]:
            step_base = int(log["trajectory"][-1]["step"])
        print(f"resuming trajectory at step {step_base}", flush=True)
    else:
        def identity_metrics(which):
            nmi = round(float(np.mean([
                normalized_mutual_information(fx, mov)
                for mov, _, fx, _ in which])), 4)
            dice = round(float(np.mean([
                mean_label_dice(fx_lab, mov_lab, NUM_LABELS)
                for _, mov_lab, _, fx_lab in which])), 4)
            return {"nmi": nmi, "dice": dice}

        log = {"workload": f"{SHAPE} / {NUM_LABELS} labels, vel_res [32, 64]",
               "warm_start": warm or "",
               "identity": {"smooth": identity_metrics(pairs),
                            "affine": identity_metrics(pairs_affine)},
               "trajectory": []}

    # seed the training-data streams from step_base so resumed legs draw
    # FRESH (map-index, synthesis-key) pairs instead of replaying the first
    # leg's stream (review finding; legs before this fix revisit the same
    # synthetic draws, epoch-style — not wrong, just less diverse)
    rng = np.random.default_rng(step_base)
    key = jax.random.PRNGKey(1 + step_base)

    def snapshot(step, loss, sps):
        nmi_s, dice_s, mf_s = evaluate(params, pairs)
        nmi_a, dice_a, mf_a = evaluate(params, pairs_affine)
        # checkpoint BEFORE the results file (crash-safe resume ordering —
        # see learn_ref_workload.snapshot)
        trainer.save_checkpoint(os.path.join(HERE, "_learn_m1_ckpt"), params,
                                epoch=step_base + step)
        os.replace(os.path.join(HERE, "_learn_m1_ckpt.npz"), CKPT)
        log["trajectory"].append({
            "step": step_base + step,
            "loss": None if loss != loss else round(loss, 4),
            "smooth": {"nmi": nmi_s, "dice": dice_s, "mean_abs_flow_vox": mf_s},
            "affine": {"nmi": nmi_a, "dice": dice_a, "mean_abs_flow_vox": mf_a},
            "sec_per_step": round(sps, 3)})
        with open(RESULTS, "w") as f:
            json.dump(log, f, indent=1)
        print(f"step {step}: loss {loss:.4f} smooth {dice_s}/{nmi_s} "
              f"affine {dice_a}/{nmi_a} ({sps:.2f}s/step)", flush=True)

    t0 = time.time()
    if step_base == 0:
        snapshot(0, float("nan"), 0.0)
    eval_every = 1000
    for step in range(1, steps + 1):
        idx = rng.integers(len(maps), size=1)
        si, ti = trainer.put_indices(idx, idx)
        key, sub = jax.random.split(key)
        params, opt_state, aux = trainer.train_step_banked(
            params, opt_state, sub, bank, si, ti)
        if step % eval_every == 0 or step == steps:
            snapshot(step, float(aux["loss"]), (time.time() - t0) / step)

    print(json.dumps(log["trajectory"][-1]))


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12000
    if len(sys.argv) > 2:
        w = sys.argv[2]
    elif os.path.exists(CKPT):
        w = CKPT  # continue our own model1 run
    else:
        # warm start from the 50k flagship: conv weights are deformation-
        # statistics-agnostic features; the head adapts to smooth fields
        w = os.path.join(HERE, "learned_ref_160x160x192_26lab.npz")
    main(n, w)
