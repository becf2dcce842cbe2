"""TPU probe round 4: isolate dtype/rank conditions for the two crashes.

Round 3: every lane-axis concat and every make_async_copy variant at the
conv_pool shapes dies in the remote compiler; the sum-of-27 K=2 matmuls
compiles. Remaining axes to cut: f32 vs bf16 (round-1's passing concat was
f32), tensor rank / lane width for the DMA, and an im2col built by STORING
taps into lane slices of a scratch (concat-free, K=54 matmul).
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

FX, FY, Z, CIN, COUT = 4, 16, 192, 2, 64


def report(name, fn, results):
    try:
        out = fn()
        results[name] = f"ok sum={float(jnp.sum(out.astype(jnp.float32))):.3f}"
    except Exception as e:  # noqa: BLE001
        results[name] = f"FAIL {str(e)[:100]}"
    print(json.dumps({name: results[name]}), flush=True)


def main():
    rng = np.random.default_rng(0)
    results = {}

    # --- concat: dtype cut ---
    def concat3(shape_in, fx, fy, z, dt):
        x = jnp.asarray(rng.normal(size=shape_in).astype(np.float32)).astype(dt)

        def kern(x_ref, o_ref):
            taps = [x_ref[1:1 + fx, 1:1 + fy, dz:dz + z, :] for dz in range(3)]
            o_ref[:] = jnp.concatenate(taps, axis=-1)

        def run():
            f = pl.pallas_call(
                kern,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(
                    (fx, fy, z, 3 * shape_in[-1]), dt),
            )
            return jax.jit(f)(x)

        return run

    report("concat3_f32_real",
           concat3((FX + 2, FY + 2, Z + 2, CIN), FX, FY, Z, jnp.float32),
           results)
    report("concat3_bf16_toy",
           concat3((8, 8, 32, 2), 6, 6, 30, jnp.bfloat16), results)

    # --- scratch-store im2col (no concat): taps stored into lane slices ---
    xh = jnp.asarray(rng.normal(size=(FX + 2, FY + 2, Z + 2, CIN))
                     .astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(27 * CIN, COUT)).astype(np.float32)
                    ).astype(jnp.bfloat16)

    def k_store(x_ref, w_ref, o_ref, s_ref):
        t = 0
        for dx in range(3):
            for dy in range(3):
                for dz in range(3):
                    tap = x_ref[dx:dx + FX, dy:dy + FY, dz:dz + Z, :]
                    s_ref[:, :, :, t * CIN:(t + 1) * CIN] = tap
                    t += 1
        v = s_ref[:].reshape(FX * FY * Z, 27 * CIN)
        o_ref[:] = jnp.dot(v, w_ref[:], preferred_element_type=jnp.float32
                           ).reshape(FX, FY, Z, COUT)

    def run_store():
        f = pl.pallas_call(
            k_store,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((FX, FY, Z, COUT), jnp.float32),
            scratch_shapes=[pltpu.VMEM((FX, FY, Z, 27 * CIN), jnp.bfloat16)],
        )
        return jax.jit(f)(xh, w)

    report("scratch_im2col_store", run_store, results)

    # --- DMA: rank/dtype/lane cuts ---
    def dma(shape_in, block, dt):
        x = jnp.asarray(rng.normal(size=shape_in).astype(np.float32)).astype(dt)
        n = shape_in[0] // block[0]

        def kern(x_hbm, o_ref, xs, sem):
            i = pl.program_id(0)
            d = pltpu.make_async_copy(x_hbm.at[pl.ds(i * block[0], block[0])],
                                      xs, sem)
            d.start()
            d.wait()
            o_ref[:] = xs[:].astype(jnp.float32)

        def run():
            f = pl.pallas_call(
                kern, grid=(n,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(
                    block, lambda i: (i,) + (0,) * (len(block) - 1),
                    memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(shape_in, jnp.float32),
                scratch_shapes=[pltpu.VMEM(block, dt),
                                pltpu.SemaphoreType.DMA(())],
            )
            return jax.jit(f)(x)

        return run

    report("dma_rank2_f32", dma((1024, 256), (256, 256), jnp.float32), results)
    report("dma_rank4_f32_lane2",
           dma((8, 2 * FY, Z, CIN), (4, 2 * FY, Z, CIN), jnp.float32), results)
    report("dma_rank4_bf16_lane128",
           dma((8, 16, 64, 128), (4, 16, 64, 128), jnp.bfloat16), results)
    report("dma_rank3_bf16",
           dma((8, 256, 256), (4, 256, 256), jnp.bfloat16), results)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
