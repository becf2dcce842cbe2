"""In-model-dtype conv lowering probe: bf16-OUT and int8->int32 arms.

The original decomp probe (`conv2d_decomp_probe.py`) compared lowerings with
f32 outputs; the model's convs write bf16, and the f32-out Conv3D baseline
overstated the direct lowering's in-model cost (PERF.md round 5c: probe
promised 1.45-2.06x per conv, the forward delivered +10 % / +6 %). This probe
times the arms the model actually runs:

  * bf16: direct Conv3D (bf16 out) vs z-tap vs x-tap decomposition
    (compute-dtype accumulation, what ConvBlock does);
  * int8: direct Conv3D (int32 out) vs z-tap vs x-tap.

The x-tap arm folds X into the conv batch dim WITHOUT a moveaxis (X is
already adjacent to batch in NXYZC), so it skips the relayout copies the
z-tap pays — the suspected eater of the int8 in-model win (z-fold moveaxis
on (32,128)-tiled int8). Run twice: cold populates the compile cache, warm
gives numbers.
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

from multimodal_registration_tpu.ops.conv3 import conv3d_direct, conv3d_tap2d


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
        ("enc0_full64", (192, 192, 192), 2, 64),
        ("enc1_96", (96, 96, 96), 64, 64),
        ("enc256_96", (96, 96, 96), 256, 256),
        ("dec256_concat_96", (96, 96, 96), 512, 256),
    ]
    results = []
    for label, shape, cin, cout in cases:
        kx, kk = jax.random.split(jax.random.PRNGKey(0))
        xb = jax.random.normal(kx, (1, *shape, cin), jnp.bfloat16)
        kb = (jax.random.normal(kk, (3, 3, 3, cin, cout), jnp.bfloat16) * 0.05)
        arms = {
            "direct": jax.jit(lambda x, k: conv3d_direct(x, k, out_dtype=jnp.bfloat16)),
            "ztap": jax.jit(lambda x, k: conv3d_tap2d(x, k, out_dtype=jnp.bfloat16, tap_axis=3)),
            "xtap": jax.jit(lambda x, k: conv3d_tap2d(x, k, out_dtype=jnp.bfloat16, tap_axis=1)),
        }
        rec = {"case": label + "_bf16"}
        for name, f in arms.items():
            rec[name + "_ms"] = round(time_fn(f, xb, kb) * 1e3, 2)
        rec["speedup_z"] = round(rec["direct_ms"] / rec["ztap_ms"], 2)
        rec["speedup_x"] = round(rec["direct_ms"] / rec["xtap_ms"], 2)
        results.append(rec)
        print(json.dumps(rec), flush=True)

        if cin >= 64:  # int8 path quantizes only wide convs
            xq = jax.random.randint(kx, (1, *shape, cin), -127, 128, jnp.int8)
            kq = jax.random.randint(kk, (3, 3, 3, cin, cout), -127, 128, jnp.int8)
            arms = {
                "direct": jax.jit(lambda x, k: conv3d_direct(x, k, out_dtype=jnp.int32)),
                "ztap": jax.jit(lambda x, k: conv3d_tap2d(x, k, out_dtype=jnp.int32, tap_axis=3)),
                "xtap": jax.jit(lambda x, k: conv3d_tap2d(x, k, out_dtype=jnp.int32, tap_axis=1)),
            }
            rec = {"case": label + "_i8"}
            for name, f in arms.items():
                rec[name + "_ms"] = round(time_fn(f, xq, kq) * 1e3, 2)
            rec["speedup_z"] = round(rec["direct_ms"] / rec["ztap_ms"], 2)
            rec["speedup_x"] = round(rec["direct_ms"] / rec["xtap_ms"], 2)
            results.append(rec)
            print(json.dumps(rec), flush=True)

    with open(__file__.replace(".py", "_results.json"), "w") as fh:
        json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
