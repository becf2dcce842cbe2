"""Probe: do Mosaic (Pallas-TPU) in-kernel gathers compile on this backend?

Re-run each round (TODO.md); round-1 results are in ops/pallas/warp3d.py.
Each probe is tiny and independent; failures are caught and reported as JSON.
"""

from __future__ import annotations

import json
import sys
import traceback

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from multimodal_registration_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np


def probe(name, fn):
    try:
        out = fn()
        ok = bool(np.isfinite(np.asarray(out)).all())
        return {"probe": name, "ok": ok}
    except Exception as e:
        return {"probe": name, "ok": False,
                "error": f"{type(e).__name__}: {str(e)[:200]}"}


def main():
    from jax.experimental import pallas as pl

    results = [{"backend": jax.default_backend()}]

    def flat_take():
        def kernel(src_ref, idx_ref, out_ref):
            out_ref[...] = jnp.take(src_ref[...].reshape(-1), idx_ref[...], axis=0)

        src = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
        idx = jnp.zeros((8, 128), jnp.int32)
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
        )(src, idx)

    def take_along_axis0():
        def kernel(src_ref, idx_ref, out_ref):
            out_ref[...] = jnp.take_along_axis(src_ref[...], idx_ref[...], axis=0)

        src = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
        idx = jnp.zeros((8, 128), jnp.int32)
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
        )(src, idx)

    def take_along_axis1():
        def kernel(src_ref, idx_ref, out_ref):
            out_ref[...] = jnp.take_along_axis(src_ref[...], idx_ref[...], axis=1)

        src = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
        idx = jnp.zeros((8, 128), jnp.int32)
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
        )(src, idx)

    def dynamic_slice_in_kernel():
        # the building block the slab design would actually need
        def kernel(src_ref, out_ref):
            out_ref[...] = jax.lax.dynamic_slice(src_ref[...], (0, 0), (8, 128))

        src = jnp.arange(16 * 128, dtype=jnp.float32).reshape(16, 128)
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
        )(src)

    for name, fn in [("flat_take", flat_take),
                     ("take_along_axis0", take_along_axis0),
                     ("take_along_axis1", take_along_axis1),
                     ("dynamic_slice", dynamic_slice_in_kernel)]:
        r = probe(name, fn)
        results.append(r)
        print(json.dumps(r), flush=True)

    return results


if __name__ == "__main__":
    main()
