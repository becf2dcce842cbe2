"""Does int8 Conv3D beat bf16 on this backend? (enc-256 inference lever probe)

The enc-256 forward (the reference's published inference architecture,
`config/config_inference.json:8-9`) is 83% conv time at 42% of the paper bf16
MXU peak (PERF.md round 4b). TPU v5e-class chips advertise 2x int8 MXU peak
(~394 TOP/s), so a quantized inference path could in principle halve the
dominant 207 ms conv block — IF XLA's Conv3D lowering actually routes
int8xint8->int32 through the MXU at rate on this backend.

This probe times the representative enc-256 conv shapes in three variants:
  bf16      — production path (reference point)
  int8      — int8 inputs/kernel, preferred_element_type=int32
  int8_deq  — int8 conv + f32 scale dequant fused at the output

and prints achieved TOP/s. Verdict gate: adopt a quantized inference mode
only if int8 >= 1.5x the bf16 rate on the 96^3x256 case (the enc-256 hot
shape); otherwise record the negative here and in PERF.md.
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
from jax import lax

DN = lax.conv_dimension_numbers((1, 1, 1, 1, 1), (1, 1, 1, 1, 1),
                                ("NXYZC", "XYZIO", "NXYZC"))


def _drain(x):
    float(jnp.sum(x.astype(jnp.float32)))


def time_variant(shape, cin, cout, variant, iters=8):
    key = jax.random.PRNGKey(0)
    kx, kw = jax.random.split(key)
    xf = jax.random.normal(kx, (1, *shape, cin), jnp.float32)
    wf = jax.random.normal(kw, (3, 3, 3, cin, cout), jnp.float32) * 0.05

    if variant == "bf16":
        x = xf.astype(jnp.bfloat16)
        w = wf.astype(jnp.bfloat16)

        @jax.jit
        def f(x):
            y = lax.conv_general_dilated(x, w, (1, 1, 1), "SAME",
                                         dimension_numbers=DN)
            return x + (jnp.sum(y) * 0).astype(x.dtype)

    elif variant in ("int8", "int8_deq"):
        x = jnp.clip(jnp.round(xf * 32), -127, 127).astype(jnp.int8)
        w = jnp.clip(jnp.round(wf * 512), -127, 127).astype(jnp.int8)
        scale = jnp.float32(1.0 / (32 * 512))

        @jax.jit
        def f(x):
            y = lax.conv_general_dilated(
                x, w, (1, 1, 1), "SAME", dimension_numbers=DN,
                preferred_element_type=jnp.int32)
            if variant == "int8_deq":
                y = y.astype(jnp.float32) * scale
            return x + (jnp.sum(y) * 0).astype(x.dtype)

    else:
        raise ValueError(variant)

    y = f(x)
    _drain(y)
    t0 = time.time()
    cur = x
    for _ in range(iters):
        cur = f(cur)
    _drain(cur)
    dt = (time.time() - t0) / iters
    vox = shape[0] * shape[1] * shape[2]
    macs = vox * 27 * cin * cout
    return round(dt * 1000, 2), round(2 * macs / dt / 1e12, 2)


def main():
    cases = [
        # the enc-256 hot shapes: levels at 96^3 and 48^3, plus a dec concat
        ("enc256_96", (96, 96, 96), 256, 256),
        ("enc256_48", (48, 48, 48), 256, 256),
        ("dec256_concat_96", (96, 96, 96), 512, 256),
        # enc-64 flagship comparison point
        ("enc64_96", (96, 96, 96), 64, 64),
    ]
    for label, shape, cin, cout in cases:
        row = {"case": label}
        for variant in ("bf16", "int8", "int8_deq"):
            try:
                ms, tops = time_variant(shape, cin, cout, variant)
                row[variant] = {"ms": ms, "tops": tops}
            except Exception as e:  # lowering may reject int8 conv outright
                row[variant] = {"error": str(e)[:200]}
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
