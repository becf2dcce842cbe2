"""Synthesis time attribution at the reference workload (160x160x192, 26 lab).

`train_breakdown.py` (round-3 block) showed synthesis is 387 ms = 51% of the
756 ms train step — bigger than the whole model fwd+bwd. This probe times
nested prefixes of the per-sample engine (`synth/image_engine.py`), the same
output-DCE ablation pattern as `fwd_breakdown.py`: stage k's jit returns
scalar sums of the stage-k outputs only, so everything after is dead-coded
away; consecutive differences attribute each stage.

Stages (one sample; the train step synthesizes TWO):
  perlin SVF draw (half-res) -> +integrate (5 steps, bf16 payload)
  -> +rescale to full -> +soft/hard label warp -> +intensity lookup + noise
  -> +Gaussian blur -> +bias field -> +normalize + gamma (= full sample).
Both `soft` and `phi` are kept live from their producing stage on (the pair's
union of consumed outputs: src keeps raw+phi, trg keeps soft).

Also timed: pair augmentation (flips + zero-borders) and the full two-sample
`synthesize` closure from the trainer, as the cross-check against the
train_breakdown synth_ms number.

NOTE: per-stage deltas here carry the tunnel's per-call RPC latency noise
(±30-50 ms observed — negative deltas possible); `train_profile.py`'s device
trace supersedes this probe for fine-grained attribution. The stage bodies
mirror the production engine (select-chain intensities, not the retired
table gathers).

Usage: synth_breakdown.py [iters] [--small]
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
    # the axon plugin ignores JAX_PLATFORMS; must be set before device APIs
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from multimodal_registration_tpu.ops.integrate import integrate_svf
from multimodal_registration_tpu.ops.resize import rescale_field
from multimodal_registration_tpu.ops.warp import warp_labels_soft_hard
from multimodal_registration_tpu.synth.augment import maybe_zero_borders, random_flips
from multimodal_registration_tpu.synth.image_engine import (
    ImageEngineConfig,
    _gaussian_blur,
    _vel_scales,
    labels_to_image,
    labels_to_image_full,
)
from multimodal_registration_tpu.synth.perlin import draw_perlin
from multimodal_registration_tpu.train.config import TrainConfig


def timed(fn, args, iters=8, key_pos=0):
    args = list(args)
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.time()
    key = args[key_pos]
    for _ in range(iters):
        key, sub = jax.random.split(key)
        args[key_pos] = sub
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    return (time.time() - t0) / iters


def main(iters: int = 8, small: bool = False):
    shape = (32, 32, 48) if small else (160, 160, 192)
    L = 8 if small else 26
    cfg = ImageEngineConfig(num_labels=L)
    r = cfg.svf_int_res
    small_shape = tuple(s // r for s in shape)
    pd = jnp.dtype(cfg.integrate_payload_dtype)
    rng = np.random.default_rng(0)
    lab = jnp.asarray(rng.integers(0, L, size=shape, dtype=np.uint8))
    key = jax.random.PRNGKey(0)

    # ---- nested prefixes of one sample's synthesis ----
    def upto(stage):
        def fn(k, lab):
            (k_svf, k_mean, k_std, k_noise, k_blur, k_bias, k_gamma,
             k_zbg) = jax.random.split(k, 8)
            svf = draw_perlin(k_svf, (*small_shape, 3), _vel_scales(cfg, r),
                              max_std=cfg.vel_std)
            if stage == 0:
                return jnp.sum(svf)
            phi_small = integrate_svf(svf / r, cfg.int_steps, payload_dtype=pd)
            if stage == 1:
                return jnp.sum(phi_small)
            phi = rescale_field(phi_small, float(r), out_shape=shape)
            if stage == 2:
                return jnp.sum(phi)
            soft, lab_idx = warp_labels_soft_hard(lab.astype(jnp.int32), phi, L)
            live = jnp.sum(phi) + jnp.sum(soft)
            if stage == 3:
                return live + jnp.sum(lab_idx)
            means = jax.random.uniform(k_mean, (L,), minval=cfg.mean_min,
                                       maxval=cfg.mean_max)
            stds = jax.random.uniform(k_std, (L,), minval=cfg.std_min,
                                      maxval=cfg.std_max)
            zero_bg = jax.random.uniform(k_zbg, ()) < cfg.zero_background
            means = means.at[0].set(jnp.where(zero_bg, 0.0, means[0]))
            stds = stds.at[0].set(jnp.where(zero_bg, 0.0, stds[0]))
            # L-way select chain, matching the production engine (the retired
            # means[lab_idx]/stds[lab_idx] tiny-table gathers this stage used
            # to time cost ~37 ms each on this TPU — PERF.md round 3c)
            img_mean = jnp.full(shape, means[0], jnp.float32)
            img_std = jnp.full(shape, stds[0], jnp.float32)
            for l in range(1, L):
                sel = lab_idx == l
                img_mean = jnp.where(sel, means[l], img_mean)
                img_std = jnp.where(sel, stds[l], img_std)
            img = img_mean + img_std * jax.random.normal(k_noise, shape)
            if stage == 4:
                return live + jnp.sum(img)
            sigma = jax.random.uniform(k_blur, (), minval=0.0, maxval=cfg.blur_std)
            img = _gaussian_blur(img, sigma, cfg.blur_radius)
            if stage == 5:
                return live + jnp.sum(img)
            bias = draw_perlin(k_bias, (*shape, 1), [cfg.bias_res],
                               max_std=cfg.bias_std)[..., 0]
            img = img * jnp.exp(bias)
            if stage == 6:
                return live + jnp.sum(img)
            lo, hi = jnp.min(img), jnp.max(img)
            img = (img - lo) / jnp.maximum(hi - lo, 1e-7)
            g = jnp.exp(cfg.gamma * jax.random.normal(k_gamma, ()))
            img = jnp.power(jnp.clip(img, 1e-7, 1.0), g)
            return live + jnp.sum(img)

        return jax.jit(fn)

    names = ["perlin_svf", "integrate", "rescale", "label_warp",
             "intensity", "blur", "bias", "norm_gamma"]
    res = {"shape": list(shape), "labels": L}
    prev = 0.0
    for i, name in enumerate(names):
        t = timed(upto(i), (key, lab), iters) * 1000
        res[f"cum_{name}_ms"] = round(t, 1)
        res[f"delta_{name}_ms"] = round(t - prev, 1)
        print(json.dumps({name: round(t, 1), "delta": round(t - prev, 1)}),
              flush=True)
        prev = t

    # ---- pair augmentation (flips + zero borders), isolated ----
    tcfg = TrainConfig.from_dict(dict(in_shape=list(shape), num_labels=L,
                                      batch_size=1, epochs=1,
                                      zero_borders_maps=True))

    @jax.jit
    def aug_only(k, s, t):
        k_flip, k_zb_s, k_zb_t = jax.random.split(k, 3)
        s, t = random_flips(k_flip, (s, t))
        s = maybe_zero_borders(k_zb_s, s, tcfg.zero_bord_scale, tcfg.zero_bord_frac)
        t = maybe_zero_borders(k_zb_t, t, tcfg.zero_bord_scale, tcfg.zero_bord_frac)
        return jnp.sum(s.astype(jnp.int32)) + jnp.sum(t.astype(jnp.int32))

    res["aug_pair_ms"] = round(timed(aug_only, (key, lab, lab), iters) * 1000, 1)
    print(json.dumps({"aug_pair_ms": res["aug_pair_ms"]}), flush=True)

    # ---- the real two-sample synthesize (cross-check vs train_breakdown) ----
    @jax.jit
    def synth_pair(k, s_lab, t_lab):
        def per_sample(k, s, t):
            k_flip, k_zb_s, k_zb_t, k_g1, k_g2 = jax.random.split(k, 5)
            s, t = random_flips(k_flip, (s, t))
            s = maybe_zero_borders(k_zb_s, s, tcfg.zero_bord_scale, tcfg.zero_bord_frac)
            t = maybe_zero_borders(k_zb_t, t, tcfg.zero_bord_scale, tcfg.zero_bord_frac)
            img1, _, raw1, phi1, _ = labels_to_image_full(k_g1, s, cfg)
            img2, map2 = labels_to_image(k_g2, t, cfg)
            return (jnp.sum(img1) + jnp.sum(raw1) + jnp.sum(phi1)
                    + jnp.sum(img2) + jnp.sum(map2))

        keys = jax.random.split(k, s_lab.shape[0])
        return jnp.sum(jax.vmap(per_sample)(keys, s_lab, t_lab))

    res["synth_pair_ms"] = round(
        timed(synth_pair, (key, lab[None], lab[None]), iters) * 1000, 1)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    argv = list(sys.argv[1:])
    small = "--small" in argv
    if small:
        argv.remove("--small")
    main(int(argv[0]) if argv else 8, small=small)
