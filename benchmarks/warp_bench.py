"""Warp-implementation shootout on the real device.

Times the trilinear warp (the framework's hot op, ~80% of round-1 inference
time) in each implementation mode at the flagship 192^3 x 3ch shape, plus the
SVF integration and the training one-hot warp. Chained async dispatch with a
scalar-readback drain (block_until_ready is unreliable on this backend).
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

import importlib

warp_mod = importlib.import_module("multimodal_registration_tpu.ops.warp")
from multimodal_registration_tpu.ops.integrate import integrate_svf


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
    results = {"backend": jax.default_backend(), "shape": list(shape)}
    half = tuple(s // 2 for s in shape)

    f0 = jnp.zeros((*shape, 3), jnp.float32)
    for mode in ("packed", "gather8"):
        os.environ["MMREG_WARP_MODE"] = mode

        @jax.jit
        def warp_self(f, _m=mode):
            return warp_mod.warp(f, f)

        results[f"warp_fullres_{mode}_ms"] = timed_chain(warp_self, f0) * 1000
        print("..", f"warp_fullres_{mode}_ms", round(results[f"warp_fullres_{mode}_ms"], 2), flush=True)

        @jax.jit
        def integ(v, _m=mode):
            return integrate_svf(v, 5)

        v0 = jnp.zeros((*half, 3), jnp.float32)
        results[f"integrate5_halfres_{mode}_ms"] = timed_chain(integ, v0) * 1000
        print("..", f"integrate5_halfres_{mode}_ms", round(results[f"integrate5_halfres_{mode}_ms"], 2), flush=True)

    os.environ["MMREG_WARP_MODE"] = "packed"

    @jax.jit
    def warp_self_bf16(f):
        return warp_mod.warp(f.astype(jnp.bfloat16), f).astype(jnp.float32)

    results["warp_fullres_packed_bf16_ms"] = timed_chain(warp_self_bf16, f0) * 1000
    print("..", "warp_fullres_packed_bf16_ms", round(results["warp_fullres_packed_bf16_ms"], 2), flush=True)

    # training one-hot warp (26 labels at the reference train shape)
    tshape = (160, 160, 192)
    lab = jnp.zeros(tshape, jnp.int32)
    os.environ["MMREG_WARP_MODE"] = "packed"

    @jax.jit
    def onehot_warp(f):
        oh = warp_mod.warp_onehot(lab, f, 26)
        return f + jnp.mean(oh) * 0.0 + jnp.sum(oh, -1, keepdims=True) * 0.0

    ft = jnp.zeros((*tshape, 3), jnp.float32)
    results["warp_onehot26_packed_ms"] = timed_chain(onehot_warp, ft) * 1000

    print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v) for k, v in results.items()}))


if __name__ == "__main__":
    main()
