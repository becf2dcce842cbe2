"""Probe the moved-image warp configurations at 192^3 on TPU.

Measures, with a smooth ~3-voxel flow (realistic registration field):
  * C=1 unbatched `warp` (chunk plan from the padded-bytes budget),
  * C=1 `warp_batch` B=1 (halo cond hoisted above the vmap),
  * C=1 `vmap(warp)` B=1 (the OLD model path: cond under vmap),
  * C=3 unbatched `warp` (the round-2 74 ms reference point).
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

from multimodal_registration_tpu.ops.warp import warp, warp_batch, _chunk_plan


def smooth_flow(key, shape, scale=3.0):
    """Coarse noise upsampled -> smooth field, |u| ~ scale voxels."""
    small = tuple(max(s // 16, 1) for s in shape)
    f = jax.random.normal(key, (*small, 3), jnp.float32) * scale
    return jax.image.resize(f, (*shape, 3), "linear")


def chain_time(fn, x, f, iters=8):
    y = fn(x, f)
    float(jnp.sum(y))
    t0 = time.time()
    cur = x
    for _ in range(iters):
        cur = fn(cur, f) * 0.999
    float(jnp.sum(cur))
    return (time.time() - t0) / iters * 1000


def main(shape=(192, 192, 192)):
    f = smooth_flow(jax.random.PRNGKey(1), shape)
    print(json.dumps({"plan_c1": _chunk_plan(*shape, 1, 4),
                      "plan_c3": _chunk_plan(*shape, 3, 4),
                      "max_flow_x": round(float(jnp.max(jnp.abs(f[..., 0]))), 2)}),
          flush=True)

    res = {}
    v1 = jax.random.normal(jax.random.PRNGKey(0), (*shape, 1), jnp.float32)
    res["c1_unbatched_ms"] = round(chain_time(jax.jit(warp), v1, f), 1)
    print(json.dumps(res), flush=True)

    vb, fb = v1[None], f[None]
    res["c1_warp_batch_b1_ms"] = round(chain_time(jax.jit(warp_batch), vb, fb), 1)
    print(json.dumps(res), flush=True)

    vm = jax.jit(jax.vmap(lambda a, b: warp(a, b)))
    res["c1_vmap_old_b1_ms"] = round(chain_time(vm, vb, fb), 1)
    print(json.dumps(res), flush=True)

    v3 = jax.random.normal(jax.random.PRNGKey(2), (*shape, 3), jnp.float32)
    res["c3_unbatched_ms"] = round(chain_time(jax.jit(warp), v3, f), 1)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
