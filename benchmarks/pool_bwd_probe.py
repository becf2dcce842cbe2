"""TPU probe: max-pool adjoint formulations at the training shape.

unet_bwd_probe put conv+pool backward at ~79-87 ms regardless of XLA-level
formulation (SelectAndScatter vs elementwise mask/count) while the traffic
roofline is ~2-4 ms. This probe times the isolated adjoints at
(160,160,192,64) bf16 — including the VMEM-tiled Pallas kernel
(`ops/pallas/pool_bwd.py`) — and checks the kernel's output against
SelectAndScatter on device.

Usage: pool_bwd_probe.py [iters] [--small]
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

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from multimodal_registration_tpu.ops import pool as pool_mod


def timed(fn, *args, iters=8):
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    return (time.time() - t0) / iters * 1000


def main(iters=8, small=False):
    shape = (32, 32, 16) if small else (160, 160, 192)
    C = 8 if small else 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(*shape, C)).astype(np.float32)).astype(
        jnp.bfloat16)
    half = tuple(s // 2 for s in shape)
    g = jnp.asarray(rng.normal(size=(*half, C)).astype(np.float32)).astype(
        jnp.bfloat16)
    res = {"shape": list(shape), "C": C}

    # A) SelectAndScatter (autodiff of nn.max_pool)
    def a(xx, gg):
        _, vjp = jax.vjp(
            lambda v: nn.max_pool(v[None], (2, 2, 2), (2, 2, 2))[0], xx)
        return vjp(gg)[0]

    a_j = jax.jit(a)
    res["selectscatter_ms"] = round(timed(a_j, x, g, iters=iters), 1)
    print(json.dumps({k: res[k] for k in ("selectscatter_ms",)}), flush=True)

    # B) XLA elementwise mask/count custom bwd
    y = jax.jit(pool_mod._pool_fwd_raw)(x)
    b_j = jax.jit(lambda xx, yy, gg: pool_mod._bwd((xx, yy), gg)[0])
    os.environ["MMREG_PALLAS_POOL_BWD"] = "0"
    res["xla_mask_ms"] = round(timed(b_j, x, y, g, iters=iters), 1)
    print(json.dumps({k: res[k] for k in ("xla_mask_ms",)}), flush=True)

    # C) Pallas VMEM-tiled kernel, block sweep
    from multimodal_registration_tpu.ops.pallas.pool_bwd import max_pool_2x_bwd

    from multimodal_registration_tpu.ops.pallas.pool_bwd import (
        max_pool_2x_bwd_v3,
    )

    ref = np.asarray(a_j(x, g).astype(jnp.float32))
    for blk, fn, ver in (
        ((4, 8), max_pool_2x_bwd, "v2"),
        ((2, 4), max_pool_2x_bwd_v3, "v3"),
        ((2, 16), max_pool_2x_bwd_v3, "v3"),
        ((2, 8), max_pool_2x_bwd_v3, "v3"),
        ((4, 8), max_pool_2x_bwd_v3, "v3"),
    ):
        tag = f"pallas_{ver}_{blk[0]}x{blk[1]}"
        try:
            c_j = jax.jit(lambda xx, gg, b=blk, f=fn: f(xx, gg, block=b))
            ms = timed(c_j, x, g, iters=iters)
            err = float(np.max(np.abs(
                np.asarray(c_j(x, g).astype(jnp.float32)) - ref)))
            res[f"{tag}_ms"] = round(ms, 2)
            res[f"{tag}_maxerr"] = round(err, 5)
        except Exception as e:  # noqa: BLE001
            import re

            msg = re.sub(r"\x1b\[[0-9;]*m", "", str(e))
            res[f"{tag}_error"] = msg[:200] + " ... " + msg[-400:]
        print(json.dumps({k: v for k, v in res.items() if k.startswith(tag)}),
              flush=True)

    print(json.dumps(res))


if __name__ == "__main__":
    argv = list(sys.argv[1:])
    small = "--small" in argv
    if small:
        argv.remove("--small")
    main(int(argv[0]) if argv else 8, small=small)
