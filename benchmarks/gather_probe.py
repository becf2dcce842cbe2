"""Microbenchmark: what governs TPU gather throughput on this backend?

Sweeps gather source size, row width, payload dtype, and index locality to
locate the performance cliff seen between 96^3 (2.2 G elem/s) and 192^3
(0.46 G elem/s) packed warps. Drives the warp-kernel design (PERF.md).
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
import numpy as np


def timed(fn, *args, iters=6):
    out = fn(*args)
    float(jnp.sum(out))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.time() - t0) / iters


def probe(v_rows, width, dtype, n_idx, local=True, seed=0):
    """Gather n_idx rows of `width` from a (v_rows, width) source."""
    key = jax.random.PRNGKey(seed)
    src = jax.random.normal(key, (v_rows, width), jnp.float32).astype(dtype)
    if local:
        # smooth, nearly sequential indices (warp-like access pattern)
        idx = jnp.clip(
            jnp.arange(n_idx, dtype=jnp.int32) * (v_rows // max(n_idx, 1))
            + jax.random.randint(key, (n_idx,), -2, 3),
            0, v_rows - 1,
        )
    else:
        idx = jax.random.randint(key, (n_idx,), 0, v_rows, dtype=jnp.int32)

    take = jax.jit(lambda s, i: jnp.take(s, i, axis=0))
    dt = timed(take, src, idx)
    elems = n_idx * width
    return {
        "src_mb": round(v_rows * width * jnp.dtype(dtype).itemsize / 1e6, 1),
        "rows": n_idx,
        "width": width,
        "dtype": str(jnp.dtype(dtype).name),
        "local": local,
        "ms": round(dt * 1000, 2),
        "gelem_s": round(elems / dt / 1e9, 3),
        "mrow_s": round(n_idx / dt / 1e6, 1),
    }


def main():
    results = []
    N = 7_077_888  # 192^3 output voxels

    cases = [
        # source-size sweep at fixed width 24 f32, fixed 7.1M rows
        dict(v_rows=884_736, width=24, dtype=jnp.float32, n_idx=N),      # 85 MB
        dict(v_rows=2_097_152, width=24, dtype=jnp.float32, n_idx=N),    # 201 MB
        dict(v_rows=4_096_000, width=24, dtype=jnp.float32, n_idx=N),    # 393 MB
        dict(v_rows=7_077_888, width=24, dtype=jnp.float32, n_idx=N),    # 680 MB
        # dtype at the big source
        dict(v_rows=7_077_888, width=24, dtype=jnp.bfloat16, n_idx=N),   # 340 MB
        dict(v_rows=7_077_888, width=24, dtype=jnp.int8, n_idx=N),       # 170 MB
        # width at the big source (narrow vs wide rows)
        dict(v_rows=7_077_888, width=3, dtype=jnp.float32, n_idx=N * 8),
        dict(v_rows=7_077_888, width=128, dtype=jnp.float32, n_idx=N // 4),
        # locality
        dict(v_rows=7_077_888, width=24, dtype=jnp.float32, n_idx=N, local=False),
    ]
    for c in cases:
        r = probe(**c)
        results.append(r)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
