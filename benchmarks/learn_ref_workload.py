"""Hardware learning validation at the REFERENCE workload.

160x160x192 volumes, 26 labels (config/config.json:14-16,29-31) — the round-1
validation ran at 96^3/16. Warm-starts from the round-1 24k-step checkpoint
(shape-agnostic conv params), trains fused steps on device, and logs held-out
same-subject Dice/NMI vs the identity baseline every eval_every steps to
``learn_ref_results.json`` (incremental, crash-safe). Checkpoints the params
alongside.

Usage: python benchmarks/learn_ref_workload.py [steps] [warm_start_npz]
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

HERE = os.path.dirname(os.path.abspath(__file__))
SHAPE = (160, 160, 192)
NUM_LABELS = 26
RESULTS = os.path.join(HERE, "learn_ref_results.json")
CKPT = os.path.join(HERE, "learned_ref_160x160x192_26lab.npz")


def _set_width_paths(width: int) -> None:
    """--width 256 trains the PUBLISHED inference architecture
    (config_inference.json:8-9) with its own checkpoint/trajectory files."""
    global RESULTS, CKPT
    if width:
        RESULTS = os.path.join(HERE, f"learn_w{width}_results.json")
        CKPT = os.path.join(HERE, f"learned_w{width}_160x160x192_26lab.npz")


def mean_label_dice(a_lab, b_lab, num_labels):
    ds = []
    for l in range(1, num_labels):
        ta, tb = a_lab == l, b_lab == l
        denom = ta.sum() + tb.sum()
        if denom == 0:
            continue
        ds.append(2.0 * np.logical_and(ta, tb).sum() / denom)
    return float(np.mean(ds)) if ds else 1.0


def main(steps: int = 6000, warm: str | None = None, width: int = 0):
    _set_width_paths(width)
    d = dict(
        in_shape=list(SHAPE),
        num_labels=NUM_LABELS,
        num_maps=40,
        batch_size=1,
        lr=1e-4,
        grad_clip_norm=1.0,
        epochs=1,
        same_subj=True,
    )
    if width:
        d["enc"] = [width] * 4
        d["dec"] = [width] * 6
    cfg = TrainConfig.from_dict(d)
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

    # held-out pairs are pinned to the HISTORICAL engine settings (/2 SVF
    # integration, convolve blur lowering) so the Dice/NMI trajectory stays
    # comparable across legs even as training-time defaults evolve
    # (svf_int_res=4 / shifts blur adopted round 3d).
    import dataclasses as _dc

    eval_cfg = _dc.replace(trainer.engine_cfg, svf_int_res=2)

    def make_pair(seed):
        k1, k2 = jax.random.split(jax.random.PRNGKey(5000 + seed))
        lab = jnp.asarray(maps[seed % len(maps)])
        img1, oh1 = labels_to_image(k1, lab, eval_cfg)
        img2, oh2 = labels_to_image(k2, lab, eval_cfg)
        return (np.asarray(img1), np.asarray(jnp.argmax(oh1, -1)),
                np.asarray(img2), np.asarray(jnp.argmax(oh2, -1)))

    os.environ["MMREG_BLUR_MODE"] = "convolve"  # traced by the 6 eval draws
    pairs = [make_pair(s) for s in range(3)]
    os.environ.pop("MMREG_BLUR_MODE", None)  # training synthesis traces later

    @jax.jit
    def infer(params, mov, fx, mov_lab):
        from multimodal_registration_tpu.ops.warp import warp

        out = trainer.model.apply(params, mov[None, ..., None], fx[None, ..., None])
        flow = out["flow_fullres"][0]
        moved = out["moved"][0, ..., 0]
        moved_lab = warp(mov_lab.astype(jnp.float32), flow, interp="nearest")
        return moved, moved_lab, jnp.mean(jnp.abs(flow))

    def evaluate(params):
        nmis, dices, flows = [], [], []
        for mov_img, mov_lab, fx_img, fx_lab in pairs:
            moved, moved_lab, mf = infer(
                params, jnp.asarray(mov_img), jnp.asarray(fx_img), jnp.asarray(mov_lab))
            nmis.append(normalized_mutual_information(fx_img, np.asarray(moved)))
            dices.append(mean_label_dice(fx_lab, np.asarray(moved_lab), NUM_LABELS))
            flows.append(float(mf))
        return (round(float(np.mean(nmis)), 4), round(float(np.mean(dices)), 4),
                round(float(np.mean(flows)), 3))

    # resuming from our own checkpoint continues the committed trajectory
    # (crash-safe across round boundaries) instead of restarting the log.
    # Resume REQUIRES the checkpoint to have actually loaded — continuing a
    # trained trajectory with fresh random params would corrupt the record.
    step_base = 0
    if warm_loaded and warm == CKPT and os.path.exists(RESULTS):
        with open(RESULTS) as f:
            log = json.load(f)
        log["warm_start"] = warm
        if log["trajectory"]:
            step_base = int(log["trajectory"][-1]["step"])
        print(f"resuming trajectory at step {step_base}", flush=True)
    else:
        base_nmi = round(float(np.mean([
            normalized_mutual_information(fx, mov) for mov, _, fx, _ in pairs])), 4)
        base_dice = round(float(np.mean([
            mean_label_dice(fx_lab, mov_lab, NUM_LABELS)
            for _, mov_lab, _, fx_lab in pairs])), 4)
        log = {"workload": f"{SHAPE} / {NUM_LABELS} labels",
               "warm_start": warm or "",
               "identity": {"nmi": base_nmi, "dice": base_dice},
               "trajectory": []}

    # seed the training-data streams from step_base so resumed legs draw
    # FRESH (map-index, synthesis-key) pairs instead of replaying the first
    # leg's stream (review finding; the committed 50k trajectory's legs
    # predate this fix — each leg revisited the same draws, epoch-style)
    rng = np.random.default_rng(step_base)
    key = jax.random.PRNGKey(1 + step_base)

    def snapshot(step, loss, sps):
        nmi, dice, mf = evaluate(params)
        # Checkpoint BEFORE the results file: a crash between the two writes
        # then leaves RESULTS one eval behind the checkpoint, and the resume
        # path (step_base from RESULTS) re-trains that leg instead of
        # attributing older params to a newer step (advisor round-2 finding).
        trainer.save_checkpoint(os.path.join(HERE, "_learn_ref_ckpt"), params,
                                epoch=step_base + step)
        os.replace(os.path.join(HERE, "_learn_ref_ckpt.npz"), CKPT)
        log["trajectory"].append({
            "step": step_base + step,
            # step-0 has no loss yet; use None (valid strict JSON), not NaN.
            "loss": None if loss != loss else round(loss, 4), "nmi": nmi,
            "dice": dice, "mean_abs_flow_vox": mf, "sec_per_step": round(sps, 3)})
        with open(RESULTS, "w") as f:
            json.dump(log, f, indent=1)
        print(f"step {step}: loss {loss:.4f} dice {dice} nmi {nmi} "
              f"flow {mf} ({sps:.2f}s/step)", flush=True)

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
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("steps", nargs="?", type=int, default=6000)
    ap.add_argument("warm", nargs="?", default=None,
                    help="warm-start checkpoint (default: resume our own run "
                         "at these widths if present)")
    ap.add_argument("--width", type=int, default=0,
                    help="override enc/dec widths (256 = the published "
                         "inference architecture)")
    a = ap.parse_args()
    _set_width_paths(a.width)
    w = a.warm
    if w is None:
        if os.path.exists(CKPT):
            w = CKPT  # continue our own run at these widths
        elif not a.width:
            w = os.path.join(HERE, "learned_96cube_16lab_24k.npz")
        # else: widths differ from every existing checkpoint → from scratch
    main(a.steps, w, width=a.width)
