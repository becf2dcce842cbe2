"""TPU probe round 2: which conv_pool.py building block triggers the remote
tpu_compile_helper HTTP-500 at REAL sizes.

mosaic_bisect_probe.py (toy shapes) showed stride-2 slices are cleanly
rejected ("Only 2D gather is supported") and the pair-split reshape+max
compiles. With the pool rewritten to pair-splits, the full kernel now dies
with an opaque remote-compile internal error instead. Candidates at real
sizes (block 2x8 -> full tile fx=4, fy=16, Z=192, Cin=2, Cout=64): the manual
halo DMA from an ANY-space ref, the 27-tap lane concat, the major-collapse
matmul, or the 5-D pair-split maxes. One variant per kernel below.
"""

from __future__ import annotations

import functools
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

FX, FY, Z, CIN, COUT = 4, 16, 192, 2, 64


def report(name, fn, results):
    try:
        out = fn()
        results[name] = f"ok sum={float(jnp.sum(out.astype(jnp.float32))):.3f}"
    except Exception as e:  # noqa: BLE001
        results[name] = f"FAIL {str(e)[:120]}"
    print(json.dumps({name: results[name]}), flush=True)


def main():
    rng = np.random.default_rng(0)
    results = {}

    # 1. manual halo DMA from ANY-space HBM ref into VMEM scratch, grid 2x2
    xp = jnp.asarray(rng.normal(size=(2 * FX + 2, 2 * FY + 2, Z + 2, CIN))
                     .astype(np.float32)).astype(jnp.bfloat16)

    def k_dma(x_hbm, o_ref, xs, sem):
        i, j = pl.program_id(0), pl.program_id(1)
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * FX, FX + 2), pl.ds(j * FY, FY + 2)], xs, sem)
        dma.start()
        dma.wait()
        o_ref[:] = xs[1:1 + FX, 1:1 + FY, 1:1 + Z, :].astype(jnp.float32)

    def run_dma():
        f = pl.pallas_call(
            k_dma, grid=(2, 2),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((FX, FY, Z, CIN), lambda i, j: (i, j, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2 * FX, 2 * FY, Z, CIN), jnp.float32),
            scratch_shapes=[pltpu.VMEM((FX + 2, FY + 2, Z + 2, CIN), jnp.bfloat16),
                            pltpu.SemaphoreType.DMA(())],
        )
        return jax.jit(f)(xp)

    report("dma_halo", run_dma, results)

    # 2. 27-tap lane concat at real size (VMEM in/out, single program)
    xh = jnp.asarray(rng.normal(size=(FX + 2, FY + 2, Z + 2, CIN))
                     .astype(np.float32)).astype(jnp.bfloat16)

    def k_concat(x_ref, o_ref):
        taps = []
        for dx in range(3):
            for dy in range(3):
                for dz in range(3):
                    taps.append(x_ref[dx:dx + FX, dy:dy + FY, dz:dz + Z, :])
        o_ref[:] = jnp.concatenate(taps, axis=-1)

    def run_concat():
        f = pl.pallas_call(
            k_concat,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((FX, FY, Z, 27 * CIN), jnp.bfloat16),
        )
        return jax.jit(f)(xh)

    report("concat27_real", run_concat, results)

    # 3. collapse-reshape matmul at real size (im2col (12288, 54) x (54, 64))
    xi = jnp.asarray(rng.normal(size=(FX, FY, Z, 27 * CIN)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(27 * CIN, COUT)).astype(np.float32)
                    ).astype(jnp.bfloat16)

    def k_mm(x_ref, w_ref, o_ref):
        v = x_ref[:].reshape(FX * FY * Z, 27 * CIN)
        o_ref[:] = jnp.dot(v, w_ref[:], preferred_element_type=jnp.float32
                           ).reshape(FX, FY, Z, COUT)

    def run_mm():
        f = pl.pallas_call(
            k_mm,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((FX, FY, Z, COUT), jnp.float32),
        )
        return jax.jit(f)(xi, w)

    report("collapse_matmul_real", run_mm, results)

    # 4. the three 5-D pair-split maxes at real size
    xf = jnp.asarray(rng.normal(size=(FX, FY, Z, COUT)).astype(np.float32))

    def k_pool(x_ref, o_ref):
        v = x_ref[:]
        p = v.reshape(FX // 2, 2, FY, Z, COUT).max(axis=1)
        p = p.reshape(FX // 2, FY // 2, 2, Z, COUT).max(axis=2)
        p = p.reshape(FX // 2, FY // 2, Z // 2, 2, COUT).max(axis=3)
        o_ref[:] = p

    def run_pool():
        f = pl.pallas_call(
            k_pool,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((FX // 2, FY // 2, Z // 2, COUT),
                                           jnp.float32),
        )
        return jax.jit(f)(xf)

    report("pairmax_real", run_pool, results)

    # 5. concat + matmul + pool chained (everything but the DMA)
    def k_chain(x_ref, w_ref, o_ref):
        taps = []
        for dx in range(3):
            for dy in range(3):
                for dz in range(3):
                    taps.append(x_ref[dx:dx + FX, dy:dy + FY, dz:dz + Z, :])
        v = jnp.concatenate(taps, axis=-1).reshape(FX * FY * Z, 27 * CIN)
        acc = jnp.dot(v, w_ref[:], preferred_element_type=jnp.float32)
        full = acc.reshape(FX, FY, Z, COUT)
        p = full.reshape(FX // 2, 2, FY, Z, COUT).max(axis=1)
        p = p.reshape(FX // 2, FY // 2, 2, Z, COUT).max(axis=2)
        p = p.reshape(FX // 2, FY // 2, Z // 2, 2, COUT).max(axis=3)
        o_ref[:] = p

    def run_chain():
        f = pl.pallas_call(
            k_chain,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((FX // 2, FY // 2, Z // 2, COUT),
                                           jnp.float32),
        )
        return jax.jit(f)(xh, w)

    report("chain_no_dma", run_chain, results)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
