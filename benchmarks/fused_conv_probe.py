"""TPU probe: fused first-conv+pool Pallas kernel vs the XLA conv path.

Times (a) XLA conv3+leaky+maxpool (the current first U-Net level), (b) the
fused Pallas kernel, (c) the full flagship forward with/without
MMREG_FUSED_FIRST_CONV. Run on hardware only (Mosaic needs a TPU backend);
one process at a time on the axon tunnel.
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

from multimodal_registration_tpu.ops.pallas.conv_pool import (
    conv3_lrelu_pool,
    conv3_lrelu_pool_reference,
)


def drain(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(fn, *args, iters=10):
    out = fn(*args)
    drain(out)  # compile + warm
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    drain(out)
    return (time.time() - t0) / iters * 1000.0  # ms


def main():
    shape = (192, 192, 192)
    if len(sys.argv) > 1 and sys.argv[1] == "ref":
        shape = (160, 160, 192)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(*shape, 2)).astype(np.float32))
    w = jnp.asarray(rng.normal(scale=0.1, size=(3, 3, 3, 2, 64)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))

    results = {"shape": list(shape)}

    xla = jax.jit(lambda x, w, b: conv3_lrelu_pool_reference(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), b).astype(jnp.bfloat16))
    results["xla_conv_pool_ms"] = round(timeit(xla, x, w, b), 2)

    # block = FULL-RES tile (fx, fy); pool_z=False falls back to an XLA
    # z-pool if the lane-axis pair-split reshape is rejected in-kernel
    for block, pool_z in (((4, 16), True), ((4, 16), False), ((8, 16), True),
                          ((4, 32), True), ((8, 32), True), ((16, 16), True)):
        tag = f"fused_{block[0]}x{block[1]}{'' if pool_z else '_xlaz'}"
        try:
            fused = jax.jit(lambda x, w, b, bl=block, pz=pool_z:
                            conv3_lrelu_pool(x, w, b, block=bl, pool_z=pz))
            ms = timeit(fused, x, w, b)
            # correctness vs XLA at bf16 tolerance
            err = float(jnp.max(jnp.abs(
                fused(x, w, b).astype(jnp.float32) -
                xla(x, w, b).astype(jnp.float32))))
            results[f"{tag}_ms"] = round(ms, 2)
            results[f"{tag}_maxerr"] = round(err, 4)
        except Exception as e:  # noqa: BLE001 - probe records failures
            results[f"{tag}_error"] = str(e)[:1500]
        print(json.dumps({k: v for k, v in results.items() if k.startswith(tag)}),
              flush=True)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
