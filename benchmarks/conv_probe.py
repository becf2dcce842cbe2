"""Per-level 3-D conv efficiency probe for the flagship U-Net at 192^3.

Times representative conv layers (shape, in_ch -> out_ch) in bf16 and
reports achieved TFLOP/s vs the ~197 TFLOP/s v5e bf16 peak — locates where
the 52 ms U-Net time goes and whether XLA's Conv3D lowering leaves MXU
utilization on the table (e.g. channel counts below the 128-lane width).
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
from flax import linen as nn


def time_conv(shape, cin, cout, dtype=jnp.bfloat16, iters=8, stride=1):
    conv = nn.Conv(cout, kernel_size=(3, 3, 3), strides=(stride,) * 3,
                   padding="SAME", dtype=dtype)
    x = jnp.ones((1, *shape, cin), jnp.float32)
    params = conv.init(jax.random.PRNGKey(0), x)

    @jax.jit
    def f(x):
        y = conv.apply(params, x)
        # feed back at input shape to chain iterations
        return x + jnp.sum(y).astype(x.dtype) * 0.0

    y = f(x); float(jnp.sum(y))
    t0 = time.time()
    cur = x
    for _ in range(iters):
        cur = f(cur)
    float(jnp.sum(cur))
    dt = (time.time() - t0) / iters
    out_vox = 1
    for s in shape:
        out_vox *= s // stride
    flops = out_vox * 27 * cin * cout * 2
    return round(dt * 1000, 2), round(flops / dt / 1e12, 2)


def main():
    cases = [
        # (label, shape, cin, cout, stride)
        ("enc0_full", (192, 192, 192), 2, 64, 1),
        ("enc0_stride2", (192, 192, 192), 2, 64, 2),
        ("enc1_96", (96, 96, 96), 64, 64, 1),
        ("enc2_48", (48, 48, 48), 64, 64, 1),
        ("dec_96_concat", (96, 96, 96), 128, 64, 1),
        ("final_96", (96, 96, 96), 64, 64, 1),
        ("wide_96_128ch", (96, 96, 96), 128, 128, 1),
    ]
    for label, shape, cin, cout, stride in cases:
        ms, tflops = time_conv(shape, cin, cout, stride=stride)
        print(json.dumps({"case": label, "ms": ms, "tflops": tflops}), flush=True)


if __name__ == "__main__":
    main()
