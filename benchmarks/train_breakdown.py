"""Train-step time attribution at the reference workload (160x160x192, 26 lab).

Times nested prefixes of the REAL fused step graph: synthesis only → +model
forward → +loss forward → +backward (value_and_grad) → full step (+Adam).
Consecutive differences attribute the step time (PERF.md round 2); the
model-prefix rows split the backward into model (U-Net+integrate+warp) vs
loss-tail (compose+label-warp+Dice) shares — the custom-VJP go/no-go signal
(VERDICT r3 #3). Chained PRNG keys keep dispatch async; a scalar readback
drains.

Usage: train_breakdown.py [iters] [--zline] [--zline-compose] [--small] [--svf2|--svf4]
  --zline          MMREG_ZLINE_MODEL=1 (z-line integrate + moved warp)
  --zline-compose  MMREG_ZLINE_COMPOSE=1 (z-line generator-field compose)
  --small          32x32x48 / 8-label workload for CPU smoke testing
  --svf2 / --svf4  override svf_int_res (default: the TrainConfig default)
  --grad2          grad_res=2 (smoothness penalty on the int-res warp)
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

from multimodal_registration_tpu.train.config import TrainConfig
from multimodal_registration_tpu.train.trainer import Trainer, make_loss_fn


def timed(fn, args, iters=6, key_pos=0):
    """Run fn chained on the PRNG key; returns sec/iter."""
    args = list(args)
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: float(jnp.sum(jnp.abs(x.astype(jnp.float32)))) if hasattr(x, "astype") else x,
                           out if isinstance(out, tuple) else (out,))
    t0 = time.time()
    key = args[key_pos]
    for _ in range(iters):
        key, sub = jax.random.split(key)
        args[key_pos] = sub
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    return (time.time() - t0) / iters


def main(iters: int = 6, small: bool = False, svf_int_res: int | None = None,
         grad_res: int | None = None):
    shape = [32, 32, 48] if small else [160, 160, 192]
    nlab = 8 if small else 26
    over = {} if svf_int_res is None else {"svf_int_res": svf_int_res}
    if grad_res is not None:
        over["grad_res"] = grad_res
    cfg = TrainConfig.from_dict(dict(
        in_shape=shape, num_labels=nlab, batch_size=1,
        zero_borders_maps=True, epochs=1, **over,
    ))
    trainer = Trainer(cfg)
    params, opt_state = trainer.init_state()
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(0, nlab, size=(1, *shape), dtype=np.uint8))
    trg = jnp.asarray(rng.integers(0, nlab, size=(1, *shape), dtype=np.uint8))
    key = jax.random.PRNGKey(0)

    loss_fn = make_loss_fn(trainer.model, trainer.engine_cfg, cfg, True)

    # 1. synthesis only (reuse the internal closure via a thin re-build)
    from multimodal_registration_tpu.synth.augment import maybe_zero_borders, random_flips
    from multimodal_registration_tpu.synth.image_engine import labels_to_image, labels_to_image_full

    @jax.jit
    def synth_only(key, s_lab, t_lab):
        def per_sample(k, s, t):
            k_flip, k_zb_s, k_zb_t, k_g1, k_g2 = jax.random.split(k, 5)
            s, t = random_flips(k_flip, (s, t))
            s = maybe_zero_borders(k_zb_s, s, cfg.zero_bord_scale, cfg.zero_bord_frac)
            t = maybe_zero_borders(k_zb_t, t, cfg.zero_bord_scale, cfg.zero_bord_frac)
            img1, _, raw1, phi1, _ = labels_to_image_full(k_g1, s, trainer.engine_cfg)
            img2, map2 = labels_to_image(k_g2, t, trainer.engine_cfg)
            return img1, raw1, phi1, img2, map2

        keys = jax.random.split(key, s_lab.shape[0])
        return jax.vmap(per_sample)(keys, s_lab, t_lab)

    # synth + model.apply only (no compose/label-warp/Dice tail): the
    # model-vs-loss-tail split of the forward and backward
    def _synth(key, s_lab, t_lab):
        def per_sample(k, s, t):
            k_flip, k_zb_s, k_zb_t, k_g1, k_g2 = jax.random.split(k, 5)
            s, t = random_flips(k_flip, (s, t))
            s = maybe_zero_borders(k_zb_s, s, cfg.zero_bord_scale, cfg.zero_bord_frac)
            t = maybe_zero_borders(k_zb_t, t, cfg.zero_bord_scale, cfg.zero_bord_frac)
            img1, _, raw1, phi1, _ = labels_to_image_full(k_g1, s, trainer.engine_cfg)
            img2, map2 = labels_to_image(k_g2, t, trainer.engine_cfg)
            return img1, raw1, phi1, img2, map2

        keys = jax.random.split(key, s_lab.shape[0])
        return jax.vmap(per_sample)(keys, s_lab, t_lab)

    def model_loss(params, key, s, t):
        img1, raw1, phi1, img2, map2 = _synth(key, s, t)
        out = trainer.model.apply(params, img1[..., None], img2[..., None])
        return (jnp.sum(out["moved"].astype(jnp.float32))
                + jnp.sum(out["flow_fullres"].astype(jnp.float32)))

    @jax.jit
    def model_fwd(key, params, s, t):
        return model_loss(params, key, s, t)

    @jax.jit
    def model_fwd_bwd(key, params, s, t):
        return jax.value_and_grad(model_loss)(params, key, s, t)

    @jax.jit
    def fwd_only(key, params, s, t):
        loss, aux = loss_fn(params, key, s, t)
        return loss

    @jax.jit
    def fwd_bwd(key, params, s, t):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, key, s, t)
        return loss, grads

    @jax.jit
    def full_step(key, params, opt_state, s, t):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, key, s, t)
        updates, opt_state2 = trainer.optimizer.update(grads, opt_state, params)
        params2 = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return loss, params2, opt_state2

    res = {"zline": os.environ.get("MMREG_ZLINE_MODEL", "0") == "1",
           "zline_compose": os.environ.get("MMREG_ZLINE_COMPOSE", "0") == "1",
           "svf_int_res": cfg.svf_int_res, "grad_res": cfg.grad_res}
    res["synth_ms"] = round(timed(synth_only, (key, src, trg), iters) * 1000, 1)
    print(json.dumps({"synth_ms": res["synth_ms"]}), flush=True)
    res["model_fwd_ms"] = round(
        timed(model_fwd, (key, params, src, trg), iters) * 1000, 1)
    print(json.dumps({"model_fwd_ms": res["model_fwd_ms"]}), flush=True)
    res["model_fwd_bwd_ms"] = round(
        timed(model_fwd_bwd, (key, params, src, trg), iters) * 1000, 1)
    print(json.dumps({"model_fwd_bwd_ms": res["model_fwd_bwd_ms"]}), flush=True)
    res["fwd_ms"] = round(timed(fwd_only, (key, params, src, trg), iters) * 1000, 1)
    print(json.dumps({"fwd_ms": res["fwd_ms"]}), flush=True)
    res["fwd_bwd_ms"] = round(timed(fwd_bwd, (key, params, src, trg), iters) * 1000, 1)
    print(json.dumps({"fwd_bwd_ms": res["fwd_bwd_ms"]}), flush=True)
    res["full_step_ms"] = round(
        timed(full_step, (key, params, opt_state, src, trg), iters) * 1000, 1)
    res["bwd_attributed_ms"] = round(res["fwd_bwd_ms"] - res["fwd_ms"], 1)
    res["loss_fwd_attributed_ms"] = round(res["fwd_ms"] - res["synth_ms"], 1)
    # split of the backward: model (U-Net+integrate+moved-warp) vs loss tail
    # (compose+label-warp+Dice+reg)
    res["model_bwd_ms"] = round(res["model_fwd_bwd_ms"] - res["model_fwd_ms"], 1)
    res["loss_tail_bwd_ms"] = round(res["bwd_attributed_ms"] - res["model_bwd_ms"], 1)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:]]
    if "--zline" in argv:
        os.environ["MMREG_ZLINE_MODEL"] = "1"
        argv.remove("--zline")
    if "--zline-compose" in argv:
        os.environ["MMREG_ZLINE_COMPOSE"] = "1"
        argv.remove("--zline-compose")
    small = "--small" in argv
    if small:
        argv.remove("--small")
    svf = None
    for flag, val in (("--svf2", 2), ("--svf4", 4)):
        if flag in argv:
            svf = val
            argv.remove(flag)
    grad_res = None
    if "--grad2" in argv:
        grad_res = 2
        argv.remove("--grad2")
    main(int(argv[0]) if argv else 6, small=small, svf_int_res=svf,
         grad_res=grad_res)
