"""TPU probe round 3: narrow the two real-size Mosaic compiler crashes.

Round 2 (`mosaic_bisect2_probe.py`): at fx=4, fy=16, Z=192, Cin=2 the manual
halo DMA and the 27-tap lane concat both die with an opaque remote-compile
HTTP 500, while the collapse-matmul and the pair-split pool compile. Here:

  concat taps: 3 (dz only) / 9 (dx,dy only) / 27 with Z=64,
  sum-of-27-matmuls (concat-free im2col replacement),
  DMA: aligned full-block (no halo) / halo with Z=64 / halo with full
  trailing-dim indexing.
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

FX, FY, CIN, COUT = 4, 16, 2, 64


def report(name, fn, results):
    try:
        out = fn()
        results[name] = f"ok sum={float(jnp.sum(out.astype(jnp.float32))):.3f}"
    except Exception as e:  # noqa: BLE001
        results[name] = f"FAIL {str(e)[:100]}"
    print(json.dumps({name: results[name]}), flush=True)


def concat_variant(Z, taps_sel):
    rng = np.random.default_rng(0)
    xh = jnp.asarray(rng.normal(size=(FX + 2, FY + 2, Z + 2, CIN))
                     .astype(np.float32)).astype(jnp.bfloat16)

    def kern(x_ref, o_ref):
        taps = [x_ref[dx:dx + FX, dy:dy + FY, dz:dz + Z, :]
                for (dx, dy, dz) in taps_sel]
        o_ref[:] = jnp.concatenate(taps, axis=-1)

    def run():
        f = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((FX, FY, Z, len(taps_sel) * CIN),
                                           jnp.bfloat16),
        )
        return jax.jit(f)(xh)

    return run


def main():
    results = {}
    rng = np.random.default_rng(0)
    Z = 192

    taps_dz = [(1, 1, dz) for dz in range(3)]
    taps_dxy = [(dx, dy, 1) for dx in range(3) for dy in range(3)]
    taps_all = [(dx, dy, dz) for dx in range(3) for dy in range(3)
                for dz in range(3)]

    report("concat3_dz_Z192", concat_variant(192, taps_dz), results)
    report("concat9_dxy_Z192", concat_variant(192, taps_dxy), results)
    report("concat27_Z64", concat_variant(64, taps_all), results)
    report("concat9_dz3x_Z192", concat_variant(
        192, [(1, dy, dz) for dy in range(3) for dz in range(3)]), results)

    # sum-of-27-matmuls: no concat; each tap reshaped (V, Cin) and MXU'd
    xh = jnp.asarray(rng.normal(size=(FX + 2, FY + 2, Z + 2, CIN))
                     .astype(np.float32)).astype(jnp.bfloat16)
    w27 = jnp.asarray(rng.normal(size=(27, CIN, COUT)).astype(np.float32)
                      ).astype(jnp.bfloat16)

    def k_summm(x_ref, w_ref, o_ref):
        acc = jnp.zeros((FX * FY * Z, COUT), jnp.float32)
        t = 0
        for dx in range(3):
            for dy in range(3):
                for dz in range(3):
                    tap = x_ref[dx:dx + FX, dy:dy + FY, dz:dz + Z, :].reshape(
                        FX * FY * Z, CIN)
                    acc = acc + jnp.dot(tap, w_ref[t],
                                        preferred_element_type=jnp.float32)
                    t += 1
        o_ref[:] = acc.reshape(FX, FY, Z, COUT)

    def run_summm():
        f = pl.pallas_call(
            k_summm,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((FX, FY, Z, COUT), jnp.float32),
        )
        return jax.jit(f)(xh, w27)

    report("sum27_matmul_Z192", run_summm, results)

    # DMA variants
    def dma_variant(Z, halo, full_idx):
        pad = 2 if halo else 0
        xp = jnp.asarray(rng.normal(
            size=(2 * FX + pad, 2 * FY + pad, Z + pad, CIN)
        ).astype(np.float32)).astype(jnp.bfloat16)
        bs = (FX + pad, FY + pad, Z + pad, CIN)

        def kern(x_hbm, o_ref, xs, sem):
            i, j = pl.program_id(0), pl.program_id(1)
            if full_idx:
                src = x_hbm.at[pl.ds(i * FX, bs[0]), pl.ds(j * FY, bs[1]),
                               pl.ds(0, bs[2]), pl.ds(0, CIN)]
            else:
                src = x_hbm.at[pl.ds(i * FX, bs[0]), pl.ds(j * FY, bs[1])]
            dma = pltpu.make_async_copy(src, xs, sem)
            dma.start()
            dma.wait()
            h = 1 if halo else 0
            o_ref[:] = xs[h:h + FX, h:h + FY, h:h + Z, :].astype(jnp.float32)

        def run():
            f = pl.pallas_call(
                kern, grid=(2, 2),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec((FX, FY, Z, CIN),
                                       lambda i, j: (i, j, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((2 * FX, 2 * FY, Z, CIN),
                                               jnp.float32),
                scratch_shapes=[pltpu.VMEM(bs, jnp.bfloat16),
                                pltpu.SemaphoreType.DMA(())],
            )
            return jax.jit(f)(xp)

        return run

    report("dma_nohalo_Z192", dma_variant(192, False, False), results)
    report("dma_halo_Z64", dma_variant(64, True, False), results)
    report("dma_halo_fullidx_Z192", dma_variant(192, True, True), results)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
