"""labels_to_image stage attribution at the training shape (160x160x192, 26
labels). Nested-prefix DCE ablation of the synthesis engine — the train-step
breakdown shows synthesis dominates the 0.85 s step, so find which stage."""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from multimodal_registration_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_registration_tpu.ops.integrate import integrate_svf
from multimodal_registration_tpu.ops.resize import rescale_field
from multimodal_registration_tpu.ops.warp import warp, warp_onehot
from multimodal_registration_tpu.synth.image_engine import (
    ImageEngineConfig,
    _gaussian_blur,
)
from multimodal_registration_tpu.synth.perlin import draw_perlin

SHAPE = (160, 160, 192)
CFG = ImageEngineConfig(num_labels=26)


def stage_fn(upto):
    cfg = CFG
    shape = SHAPE
    L = cfg.num_labels

    def fn(key, label_map):
        (k_svf, k_mean, k_std, k_noise, k_blur, k_bias, k_gamma, k_zbg) = (
            jax.random.split(key, 8)
        )
        r = int(cfg.svf_int_res)
        small = tuple(s // r for s in shape)
        pd = jnp.dtype(cfg.integrate_payload_dtype)
        svf = draw_perlin(k_svf, (*small, 3), [cfg.vel_res / r], max_std=cfg.vel_std)
        phi_small = integrate_svf(svf / r, cfg.int_steps, payload_dtype=pd)
        phi = rescale_field(phi_small, float(r), out_shape=shape)
        if upto == "phi":
            return jnp.sum(phi)
        lab_idx = warp(label_map.astype(jnp.int8), phi, interp="nearest").astype(
            jnp.int32
        )
        if upto == "labwarp":
            return jnp.sum(lab_idx)
        means = jax.random.uniform(k_mean, (L,), minval=25.0, maxval=225.0)
        stds = jax.random.uniform(k_std, (L,), minval=5.0, maxval=25.0)
        img = means[lab_idx] + stds[lab_idx] * jax.random.normal(k_noise, shape)
        if upto == "intensity":
            return jnp.sum(img)
        sigma = jax.random.uniform(k_blur, (), minval=0.0, maxval=cfg.blur_std)
        img = _gaussian_blur(img, sigma, cfg.blur_radius)
        if upto == "blur":
            return jnp.sum(img)
        bias = draw_perlin(k_bias, (*shape, 1), [cfg.bias_res], max_std=cfg.bias_std)[..., 0]
        img = img * jnp.exp(bias)
        lo, hi = jnp.min(img), jnp.max(img)
        img = (img - lo) / jnp.maximum(hi - lo, 1e-7)
        g = jnp.exp(cfg.gamma * jax.random.normal(k_gamma, ()))
        img = jnp.power(jnp.clip(img, 1e-7, 1.0), g)
        if upto == "image":
            return jnp.sum(img)
        soft = warp_onehot(label_map.astype(jnp.int32), phi, L)
        return jnp.sum(img) + jnp.sum(soft)

    return jax.jit(fn)


def timed(fn, key, lab, iters=6):
    out = fn(key, lab)
    float(out)
    t0 = time.time()
    for i in range(iters):
        key, sub = jax.random.split(key)
        out = fn(sub, lab)
    float(out)
    return (time.time() - t0) / iters * 1000


def main():
    rng = np.random.default_rng(0)
    lab = jnp.asarray(rng.integers(0, 26, size=SHAPE, dtype=np.uint8))
    key = jax.random.PRNGKey(0)
    res = {}
    for upto in ["phi", "labwarp", "intensity", "blur", "image", "full"]:
        res[upto + "_ms"] = round(timed(stage_fn(upto), key, lab), 1)
        print(json.dumps({upto + "_ms": res[upto + "_ms"]}), flush=True)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
