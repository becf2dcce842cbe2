"""Probe: does the three-Conv2D lowering also beat Conv3D for int8 convs?

Companion to conv2d_decomp_probe.py for the quantized-inference path
(`models/unet.py::ConvBlock._int8_conv`): int8 x int8 -> int32 on the MXU,
dequant + bias + LeakyReLU epilogue. Run twice (cold populates the compile
cache, warm run gives numbers).
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
from jax import lax


def int8_conv3d(xq, kq):
    dn = lax.conv_dimension_numbers(xq.shape, kq.shape, ("NXYZC", "XYZIO", "NXYZC"))
    y = lax.conv_general_dilated(
        xq, kq, (1, 1, 1), "SAME", dimension_numbers=dn,
        preferred_element_type=jnp.int32,
    )
    return jax.nn.leaky_relu(y.astype(jnp.float32) * 1e-4, 0.2).astype(jnp.bfloat16)


def int8_conv3d_tap2d(xq, kq):
    """Taps along Z (the winning axis in the bf16 probe), int32 partials."""
    b, X, Y, Z, ci = xq.shape
    xp = jnp.pad(xq, ((0, 0), (0, 0), (0, 0), (1, 1), (0, 0)))
    out = None
    for dz in range(3):
        sl = lax.slice_in_dim(xp, dz, dz + Z, 1, axis=3)
        sl = jnp.moveaxis(sl, 3, 1).reshape(b * Z, X, Y, ci)
        kk = kq[:, :, dz]
        dn = lax.conv_dimension_numbers(sl.shape, kk.shape, ("NHWC", "HWIO", "NHWC"))
        part = lax.conv_general_dilated(
            sl, kk, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32,
        )
        out = part if out is None else out + part
    out = jnp.moveaxis(out.reshape(b, Z, X, Y, -1), 1, 3)
    return jax.nn.leaky_relu(out.astype(jnp.float32) * 1e-4, 0.2).astype(jnp.bfloat16)


def time_fn(f, *a, iters=10):
    y = f(*a)
    float(jnp.sum(y.astype(jnp.float32)))
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            y = f(*a)
        float(jnp.sum(y.astype(jnp.float32)))
        best = min(best, (time.time() - t0) / iters)
    return best


def main():
    cases = [
        ("enc1_96_i8", (96, 96, 96), 64, 64),
        ("dec_96_concat_i8", (96, 96, 96), 128, 64),
        ("enc256_96_i8", (96, 96, 96), 256, 256),
        ("dec256_concat_96_i8", (96, 96, 96), 512, 256),
    ]
    results = []
    for label, shape, cin, cout in cases:
        kx, kk = jax.random.split(jax.random.PRNGKey(0))
        xq = jax.random.randint(kx, (1, *shape, cin), -127, 128, jnp.int8)
        kq = jax.random.randint(kk, (3, 3, 3, cin, cout), -127, 128, jnp.int8)
        f3 = jax.jit(int8_conv3d)
        f2 = jax.jit(int8_conv3d_tap2d)
        err = float(jnp.max(jnp.abs(
            f2(xq, kq).astype(jnp.float32) - f3(xq, kq).astype(jnp.float32))))
        t3, t2 = time_fn(f3, xq, kq), time_fn(f2, xq, kq)
        vox = shape[0] * shape[1] * shape[2]
        fl = vox * 27 * cin * cout * 2
        rec = {"case": label, "conv3d_ms": round(t3 * 1e3, 2),
               "conv2d_ztap_ms": round(t2 * 1e3, 2),
               "tops_3d": round(fl / t3 / 1e12, 1),
               "tops_2d": round(fl / t2 / 1e12, 1),
               "speedup": round(t3 / t2, 2), "maxerr": err}
        results.append(rec)
        print(json.dumps(rec), flush=True)
    with open(__file__.replace(".py", "_results.json"), "w") as fh:
        json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
