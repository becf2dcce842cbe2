"""Component-level performance ablation on the real device.

Times the flagship forward's pieces separately (U-Net convs, SVF integration,
full-res warp, resize) using chained async dispatch with a scalar-readback
drain, so remote-tunnel dispatch latency is amortized. Guides kernel
optimization (e.g. whether the gather-based warp needs a Pallas kernel).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from multimodal_registration_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from multimodal_registration_tpu.models.unet import Unet
from multimodal_registration_tpu.ops.integrate import integrate_svf
from multimodal_registration_tpu.ops.resize import rescale_field
from multimodal_registration_tpu.ops.warp import warp


def timed_chain(fn, x, iters=8):
    x = jnp.asarray(x)
    y = fn(x)
    float(jnp.sum(y))  # compile+warm
    t0 = time.time()
    cur = x
    for _ in range(iters):
        cur = fn(cur)
    float(jnp.sum(cur))
    return (time.time() - t0) / iters


def main(shape=(192, 192, 192)):
    half = tuple(s // 2 for s in shape)
    results = {}

    # U-Net convs (bf16): returns features; chain via a reduction back to input shape
    unet = Unet(enc_nf=(64,) * 4, dec_nf=(64,) * 6, nb_upsample_skips=1, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, *shape, 2), jnp.bfloat16)
    params = unet.init(key, x0)

    @jax.jit
    def unet_fn(x):
        feat = unet.apply(params, x)  # (1, *half, 64)
        up = jnp.repeat(jnp.repeat(jnp.repeat(feat, 2, 1), 2, 2), 2, 3)
        return jnp.concatenate([up[..., :1], up[..., 1:2]], -1) + x * 0.0 + up[..., :2]

    results["unet_convs_ms"] = timed_chain(unet_fn, x0) * 1000

    # SVF integration at half res (5 steps)
    v0 = jnp.zeros((*half, 3), jnp.float32)
    results["integrate5_halfres_ms"] = timed_chain(
        jax.jit(lambda v: integrate_svf(v, 5)), v0
    ) * 1000

    # one full-res trilinear warp (3-channel field warped by itself)
    f0 = jnp.zeros((*shape, 3), jnp.float32)
    results["warp_fullres_ms"] = timed_chain(jax.jit(lambda f: warp(f, f)), f0) * 1000

    # half→full field rescale
    results["rescale_2x_ms"] = timed_chain(
        jax.jit(lambda v: rescale_field(rescale_field(v, 2.0), 0.5)), v0
    ) * 1000

    print(json.dumps({"shape": list(shape), **{k: round(v, 2) for k, v in results.items()}}))


if __name__ == "__main__":
    main()
