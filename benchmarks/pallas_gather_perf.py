"""Mosaic in-kernel gather THROUGHPUT probe (round 2: they now compile).

The Pallas warp-kernel design needs per-element arbitrary-row gathers from a
VMEM-resident (X*Y, Z) source. This times a full-volume (192^3 elements)
axis-0 take_along_axis inside a pallas_call — grid over row blocks, source
held whole in VMEM (28 MB) — against the XLA packed-warp reference point
(~31 ms for the C=1 moved warp). Also times axis-1 (lane) gathers.
"""

from __future__ import annotations

import functools
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from multimodal_registration_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

X = Y = Z = 192
M = X * Y  # source rows
RB = 256   # output rows per grid step


def rowgather_full(src, idx):
    """out[i, j] = src[idx[i, j], j] over the whole (M, Z) output."""

    def kernel(src_ref, idx_ref, out_ref):
        out_ref[...] = jnp.take_along_axis(src_ref[...], idx_ref[...], axis=0)

    return pl.pallas_call(
        kernel,
        grid=(M // RB,),
        in_specs=[
            pl.BlockSpec((M, Z), lambda i: (0, 0)),      # whole source, resident
            pl.BlockSpec((RB, Z), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((RB, Z), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M, Z), jnp.float32),
    )(src, idx)


def lanegather_full(src, idx):
    """out[i, j] = src[i, idx[i, j]] — axis-1 (lane) gather, blockwise."""

    def kernel(src_ref, idx_ref, out_ref):
        out_ref[...] = jnp.take_along_axis(src_ref[...], idx_ref[...], axis=1)

    return pl.pallas_call(
        kernel,
        grid=(M // RB,),
        in_specs=[
            pl.BlockSpec((RB, Z), lambda i: (i, 0)),
            pl.BlockSpec((RB, Z), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((RB, Z), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M, Z), jnp.float32),
    )(src, idx)


def timed(fn, *args, iters=8):
    out = fn(*args)
    float(jnp.sum(out))
    t0 = time.time()
    for _ in range(iters):
        # NOTE: independent un-chained dispatches (unlike chain_time in
        # vmap_warp_probe.py) — fine for this probe's coarse comparison
        out = fn(*args)
    float(jnp.sum(out))
    return (time.time() - t0) / iters * 1000


def main():
    key = jax.random.PRNGKey(0)
    src = jax.random.normal(key, (M, Z), jnp.float32)
    # warp-like locality: row index = own row +- small smooth offset
    base = jnp.arange(M, dtype=jnp.int32)[:, None]
    off = jax.random.randint(jax.random.PRNGKey(1), (M, Z), -3 * Y, 3 * Y)
    ridx = jnp.clip(base + off, 0, M - 1)
    lidx = jnp.clip(
        jnp.arange(Z, dtype=jnp.int32)[None, :]
        + jax.random.randint(jax.random.PRNGKey(2), (M, Z), -4, 5),
        0, Z - 1,
    )

    res = {}
    try:
        res["rowgather_ms"] = round(timed(rowgather_full, src, ridx), 2)
    except Exception as e:
        res["rowgather_error"] = f"{type(e).__name__}: {str(e)[:300]}"
    print(json.dumps(res), flush=True)
    try:
        res["lanegather_ms"] = round(timed(lanegather_full, src, lidx), 2)
    except Exception as e:
        res["lanegather_error"] = f"{type(e).__name__}: {str(e)[:300]}"
    print(json.dumps(res), flush=True)

    # correctness spot-check on a small shape via interpret mode reference
    g = np.asarray(rowgather_full(src, ridx)[:4, :8])
    ref = np.asarray(src)[np.asarray(ridx)[:4, :8], np.arange(8)[None, :]]
    res["rowgather_correct"] = bool(np.allclose(g, ref))
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
