"""TPU probe: 2x corner-aligned field upsample variants (the 12.2 ms term).

The flagship forward spends 12.2 ms rescaling the integrated half-res field to
full resolution (PERF.md round-2b attribution). The current implementation
interleaves per axis (stack+reshape); on TPU the non-minor-axis interleaves
are relayout-heavy. Variants probed:
  * A: current (axes 0,1,2 order),
  * B: reversed axis order (minor axis first),
  * C: repeat+shift+average (no stack/reshape),
  * D: bf16 payload for the interleave (halve relayout bytes; vectors scaled
       in f32 afterwards).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from multimodal_registration_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

from multimodal_registration_tpu.ops.resize import _upsample2x_axis, rescale_field


def up2_repeat_shift(v, axis):
    n = v.shape[axis]
    u = jnp.repeat(v, 2, axis=axis)
    w = jnp.concatenate(
        [lax.slice_in_dim(u, 1, 2 * n, axis=axis),
         lax.slice_in_dim(u, 2 * n - 1, 2 * n, axis=axis)], axis=axis)
    return 0.5 * (u + w)


def drain(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(fn, *args, iters=20):
    drain(fn(*args))
    t0 = time.time()
    out = None
    for _ in range(iters):
        out = fn(*args)
    drain(out)
    return (time.time() - t0) / iters * 1000.0


def main():
    half = (96, 96, 96)
    rng = np.random.default_rng(0)
    flow = jnp.asarray(rng.normal(size=(*half, 3)).astype(np.float32))

    variants = {
        "A_current": jax.jit(lambda f: rescale_field(f, 2, out_shape=(192,) * 3)),
        "B_reversed": jax.jit(lambda f: 2.0 * (
            _upsample2x_axis(_upsample2x_axis(_upsample2x_axis(f, 2), 1), 0))),
        "C_repeat_shift": jax.jit(lambda f: 2.0 * (
            up2_repeat_shift(up2_repeat_shift(up2_repeat_shift(f, 0), 1), 2))),
        "C_rev": jax.jit(lambda f: 2.0 * (
            up2_repeat_shift(up2_repeat_shift(up2_repeat_shift(f, 2), 1), 0))),
        "D_bf16": jax.jit(lambda f: 2.0 * (
            _upsample2x_axis(_upsample2x_axis(_upsample2x_axis(
                f.astype(jnp.bfloat16), 0), 1), 2).astype(jnp.float32))),
    }
    results = {}
    ref = None
    for name, fn in variants.items():
        try:
            results[f"{name}_ms"] = round(timeit(fn, flow), 2)
            out = np.asarray(fn(flow), np.float32)
            if ref is None:
                ref = out
            else:
                results[f"{name}_maxerr"] = round(float(np.max(np.abs(out - ref))), 5)
        except Exception as e:  # noqa: BLE001
            results[f"{name}_error"] = str(e)[:200]
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
