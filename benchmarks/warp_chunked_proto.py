"""Prototype: chunked packed-gather warp.

gather_probe.py shows this backend's gather row rate is ~110 M rows/s when
the source is < ~100 MB and collapses ~6x above ~200 MB. So: slab the packed
corner volume along X (slab = chunk + displacement halo H) and gather within
each < 100 MB slab via lax.map. Verifies vs the gather8 formulation and
times at 192^3 x 3ch.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from multimodal_registration_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import importlib

import jax
import jax.numpy as jnp
import numpy as np

warp_mod = importlib.import_module("multimodal_registration_tpu.ops.warp")
from multimodal_registration_tpu.ops.grid import identity_grid


def warp_packed_chunked(vol, flow, H=8, n_chunks=16, payload_dtype=None):
    X, Y, Z, C = vol.shape
    assert X % n_chunks == 0
    CX = X // n_chunks
    S = min(CX + 2 * H, X)
    pvol = vol if payload_dtype is None else vol.astype(payload_dtype)
    packed4 = warp_mod.pack_corners(pvol).reshape(X, Y, Z, 8 * C)
    grid = identity_grid((X, Y, Z), dtype=jnp.float32)
    dims = jnp.array([X - 1, Y - 1, Z - 1], jnp.float32)
    c = jnp.clip(grid + flow.astype(jnp.float32), 0.0, dims)
    i0 = jnp.floor(c).astype(jnp.int32)
    w = (c - i0.astype(jnp.float32))
    w8 = warp_mod._corner_weights(w)  # (X,Y,Z,8)

    def chunk_fn(k):
        x0 = k * CX
        s = jnp.clip(x0 - H, 0, X - S)
        slab = jax.lax.dynamic_slice(packed4, (s, 0, 0, 0), (S, Y, Z, 8 * C))
        i0c = jax.lax.dynamic_slice(i0, (x0, 0, 0, 0), (CX, Y, Z, 3))
        ixr = jnp.clip(i0c[..., 0] - s, 0, S - 1)
        lin = (ixr * Y + i0c[..., 1]) * Z + i0c[..., 2]
        rows = jnp.take(slab.reshape(S * Y * Z, 8 * C), lin.reshape(-1), axis=0)
        blocks = rows.reshape(CX, Y, Z, 8, C).astype(jnp.float32)
        w8c = jax.lax.dynamic_slice(w8, (x0, 0, 0, 0), (CX, Y, Z, 8))
        return jnp.einsum("...kc,...k->...c", blocks, w8c,
                          precision=jax.lax.Precision.HIGHEST)

    out = jax.lax.map(chunk_fn, jnp.arange(n_chunks))
    return out.reshape(X, Y, Z, C).astype(vol.dtype)


def timed_chain(fn, x, iters=8):
    y = fn(x)
    float(jnp.sum(y))
    t0 = time.time()
    cur = x
    for _ in range(iters):
        cur = fn(cur)
    float(jnp.sum(cur))
    return (time.time() - t0) / iters


def main():
    # correctness on small shape vs gather8
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.normal(size=(32, 24, 20, 3)).astype(np.float32))
    flow = jnp.asarray((rng.random((32, 24, 20, 3)) - 0.5) * 8.0, jnp.float32)
    import os
    os.environ["MMREG_WARP_MODE"] = "gather8"
    ref = warp_mod.warp(vol, flow)
    got = warp_packed_chunked(vol, flow, H=6, n_chunks=4)
    err = float(jnp.max(jnp.abs(ref - got)))
    print(json.dumps({"correctness_maxerr": err}), flush=True)
    assert err < 1e-4, err

    shape = (192, 192, 192)
    f0 = jnp.zeros((*shape, 3), jnp.float32)
    for (H, n_chunks, pd) in [(8, 16, None), (8, 16, jnp.bfloat16),
                              (8, 8, None), (16, 16, None), (8, 32, None)]:
        fn = jax.jit(lambda f, H=H, n=n_chunks, pd=pd:
                     warp_packed_chunked(f, f, H=H, n_chunks=n, payload_dtype=pd))
        ms = timed_chain(fn, f0) * 1000
        print(json.dumps({"H": H, "n_chunks": n_chunks,
                          "payload": str(pd), "warp_192_ms": round(ms, 2)}), flush=True)


if __name__ == "__main__":
    main()
