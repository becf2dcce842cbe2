"""Probe: 3-D conv as a sum of three 2-D convs — does XLA's Conv2D lowering
beat its Conv3D lowering on this TPU backend?

Motivation (PERF.md speed-of-light table): XLA Conv3D runs at 10-16% of bf16
peak at the flagship's 64-channel widths — the U-Net row's named ceiling.
TPU XLA's Conv2D path is the production-CNN path and historically tiles the
MXU far better. A 3x3x3 conv decomposes EXACTLY into three 3x3 Conv2Ds:

    out[x,y,z,co] = sum_dx conv2d_yz(in[x+dx-1], W[dx])        (zero-padded)

with the x axis folded into the conv batch dimension. If the decomposition
wins at the hot shapes (96^3 / 64-128 ch, 192^3 / cin 2), it is a pure-XLA
rewrite of ConvBlock — no Mosaic, no new numerics (same FLOPs, same order up
to f32 accumulation).

Run twice (fresh-compile process pollution, CLAUDE.md): first populates the
persistent cache, SECOND run gives the numbers.
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

from multimodal_registration_tpu.ops.conv3 import conv3d_direct, conv3d_tap2d


def conv3d(x, k, stride=1, dtype=jnp.bfloat16):
    """Reference lowering: one Conv3D (what ConvBlock does today)."""
    return conv3d_direct(x.astype(dtype), k.astype(dtype), stride)


def conv3d_as_2d(x, k, stride=1, dtype=jnp.bfloat16, axis=1):
    """Three-Conv2D lowering (ops/conv3.py::conv3d_tap2d)."""
    return conv3d_tap2d(x.astype(dtype), k.astype(dtype), stride, tap_axis=axis)


def time_fn(f, x, iters=10):
    y = f(x)
    float(jnp.sum(y.astype(jnp.float32)))
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            y = f(x)
        float(jnp.sum(y.astype(jnp.float32)))
        best = min(best, (time.time() - t0) / iters)
    return best


def main():
    cases = [
        ("enc1_96", (96, 96, 96), 64, 64, 1),
        ("dec_96_concat", (96, 96, 96), 128, 64, 1),
        ("enc2_48", (48, 48, 48), 64, 64, 1),
        ("enc0_full", (192, 192, 192), 2, 64, 1),
        ("enc256_96", (96, 96, 96), 256, 256, 1),
        ("dec256_concat_96", (96, 96, 96), 512, 256, 1),
    ]
    results = []
    for label, shape, cin, cout, stride in cases:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (1, *shape, cin), jnp.float32)
        k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, cin, cout),
                              jnp.float32) * 0.05

        f3 = jax.jit(lambda x, k=k, s=stride: conv3d(x, k, s))
        f2x = jax.jit(lambda x, k=k, s=stride: conv3d_as_2d(x, k, s, axis=1))
        f2z = jax.jit(lambda x, k=k, s=stride: conv3d_as_2d(x, k, s, axis=3))

        # numerics: both decompositions vs conv3d (all bf16 -> f32 accum)
        y3 = np.asarray(f3(x))
        err_x = float(np.max(np.abs(np.asarray(f2x(x)) - y3)))
        err_z = float(np.max(np.abs(np.asarray(f2z(x)) - y3)))
        ref = float(np.max(np.abs(y3)))

        t3 = time_fn(f3, x)
        tx = time_fn(f2x, x)
        tz = time_fn(f2z, x)
        vox = 1
        for s in shape:
            vox *= (s + stride - 1) // stride
        fl = vox * 27 * cin * cout * 2
        rec = {
            "case": label,
            "conv3d_ms": round(t3 * 1e3, 2),
            "conv2d_xtap_ms": round(tx * 1e3, 2),
            "conv2d_ztap_ms": round(tz * 1e3, 2),
            "tflops_3d": round(fl / t3 / 1e12, 1),
            "tflops_2d_x": round(fl / tx / 1e12, 1),
            "tflops_2d_z": round(fl / tz / 1e12, 1),
            "speedup_best": round(t3 / min(tx, tz), 2),
            "maxerr_x_rel": round(err_x / max(ref, 1e-9), 5),
            "maxerr_z_rel": round(err_z / max(ref, 1e-9), 5),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)
    with open(__file__.replace(".py", "_results.json"), "w") as fh:
        json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
