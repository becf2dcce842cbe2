"""TPU probe: bisect which op in the fused conv+pool kernel Mosaic rejects.

conv_pool.py fails on hardware with 'Only 2D gather is supported' even though
interpret mode passes. Candidates: the 27-slice lane concat, the major-axis
collapse reshape, or the stride-2 slice on the sublane (z) axis. Each variant
below isolates one op inside a minimal pallas kernel. Run on hardware, one
process at a time.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from multimodal_registration_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run_variant(name, kernel, x, out_shape, results):
    try:
        fn = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        out = jax.jit(fn)(x)
        results[name] = f"ok sum={float(jnp.sum(out)):.3f}"
    except Exception as e:  # noqa: BLE001
        results[name] = f"FAIL {str(e)[:160]}"


def main():
    rng = np.random.default_rng(0)
    X, Y, Z, C = 8, 8, 32, 2
    x = jnp.asarray(rng.normal(size=(X, Y, Z, C)).astype(np.float32))
    results = {}

    # 1. lane-axis concat of shifted slices (im2col building block)
    def k_concat(x_ref, o_ref):
        taps = [x_ref[0:6, 0:6, dz:dz + 30, :] for dz in range(3)]
        o_ref[:] = jnp.concatenate(taps, axis=-1)

    run_variant("concat_lane", k_concat, x, (6, 6, 30, 3 * C), results)

    # 2. major-axis collapse reshape + matmul + un-collapse
    def k_reshape_mm(x_ref, o_ref):
        v = x_ref[:].reshape(X * Y * Z, C)
        w = jnp.full((C, 8), 0.5, jnp.float32)
        o_ref[:] = jnp.dot(v, w, preferred_element_type=jnp.float32).reshape(
            X, Y, Z, 8)

    run_variant("collapse_matmul", k_reshape_mm, x, (X, Y, Z, 8), results)

    # 3. stride-2 slice on a MAJOR axis (x)
    def k_stride_major(x_ref, o_ref):
        v = x_ref[:]
        o_ref[:] = jnp.maximum(v[0::2], v[1::2])

    run_variant("stride2_major", k_stride_major, x, (X // 2, Y, Z, C), results)

    # 4. stride-2 slice on the SUBLANE (z) axis
    def k_stride_sublane(x_ref, o_ref):
        v = x_ref[:]
        o_ref[:] = jnp.maximum(v[:, :, 0::2], v[:, :, 1::2])

    run_variant("stride2_sublane", k_stride_sublane, x, (X, Y, Z // 2, C), results)

    # 5. pair-split reshape on the sublane axis + max over the pair axis
    def k_pairmax_sublane(x_ref, o_ref):
        v = x_ref[:].reshape(X, Y, Z // 2, 2, C)
        o_ref[:] = jnp.max(v, axis=3)

    run_variant("pairmax_sublane", k_pairmax_sublane, x, (X, Y, Z // 2, C), results)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
