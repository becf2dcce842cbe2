"""TPU probe: z-line row-reduction warp vs the packed/chunked warp.

Times the hot warp shapes of the flagship forward (PERF.md attribution):
  * moved-image warp: 192^3 x C=1, smooth inference-scale flow (~1 voxel),
  * integration step warp: 96^3 x C=3 (the scaling-and-squaring body),
and reports correctness vs the packed path. Run on hardware, one process at
a time.
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

from multimodal_registration_tpu.ops.warp import warp
from multimodal_registration_tpu.ops.warp_zline import warp_zline


def drain(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(fn, *args, iters=10):
    drain(fn(*args))
    t0 = time.time()
    out = None
    for _ in range(iters):
        out = fn(*args)
    drain(out)
    return (time.time() - t0) / iters * 1000.0


def smooth_flow(shape, scale, mag, seed):
    rng = np.random.default_rng(seed)
    coarse_shape = [max(2, s // scale) for s in shape]
    coarse = rng.normal(size=(*coarse_shape, 3)).astype(np.float32) * mag
    f = jax.image.resize(jnp.asarray(coarse), (*shape, 3), method="linear")
    return f


def probe(shape, C, scale, mag, tag, results):
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((*shape, C), dtype=np.float32))
    flow = smooth_flow(shape, scale, mag, 1)

    packed = jax.jit(lambda v, f: warp(v, f, interp="linear"))
    zline = jax.jit(lambda v, f: warp_zline(v, f))
    zline_bf16 = jax.jit(lambda v, f: warp_zline(v, f, payload_dtype=jnp.bfloat16))

    results[f"{tag}_packed_ms"] = round(timeit(packed, vol, flow), 2)
    try:
        results[f"{tag}_zline_ms"] = round(timeit(zline, vol, flow), 2)
        err = float(jnp.max(jnp.abs(zline(vol, flow) - packed(vol, flow))))
        results[f"{tag}_zline_maxerr"] = round(err, 6)
        results[f"{tag}_zline_bf16_ms"] = round(timeit(zline_bf16, vol, flow), 2)
    except Exception as e:  # noqa: BLE001 - probe records failures
        results[f"{tag}_zline_error"] = str(e)[:200]


def main():
    small = "--small" in sys.argv
    results = {"backend": jax.default_backend()}
    if small:
        probe((32, 32, 32), 1, 8, 0.5, "small_c1", results)
        probe((32, 32, 32), 3, 8, 0.5, "small_c3", results)
    else:
        # moved-image warp (192^3, C=1), inference-scale smooth flow
        probe((192, 192, 192), 1, 16, 1.0, "moved192_c1", results)
        # integration-step warp (96^3, C=3), half-SVF-scale flow
        probe((96, 96, 96), 3, 8, 0.5, "integ96_c3", results)
        # reference-workload moved warp (160x160x192)
        probe((160, 160, 192), 1, 16, 1.0, "moved_ref_c1", results)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
