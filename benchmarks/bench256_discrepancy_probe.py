"""Why does bench.py --arch infer256 read ~1250 ms/pair when fwd_breakdown
times the same full enc-256 forward at 253 ms? Candidate deltas between the
two harnesses, isolated one at a time in one process:

  A. breakdown-style: fx is a closure CONSTANT, output is one input-shaped
     array carrying sum(moved)+sum(warp)*0 (reductions fuse; no full-size
     output materialization).
  B. bench-style: fx is an argument, outputs are the materialized
     (moved, warp) tuple, chained x <- moved.
  C. A's graph with fx as an argument (tests the constant-folding delta).
  D. B's graph with the outputs reduced (tests output materialization).
  E. B at iters=3 vs iters=10 (queue-depth effect on the tunnel).
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

from multimodal_registration_tpu.models.vxm_dense import VxmConfig, VxmDense, init_params

SHAPE = (192, 192, 192)
CFG = VxmConfig(enc=(256,) * 4, dec=(256,) * 6, int_steps=5, int_res=2,
                svf_res=2, compute_dtype="bfloat16")


def main():
    model = VxmDense(cfg=CFG)
    params = init_params(CFG, inshape=(32, 32, 32))
    mov = jnp.zeros((1, *SHAPE, 1), jnp.float32)
    fx_const = jnp.ones((1, *SHAPE, 1), jnp.float32)
    results = {}

    def report(k, v):
        results[k] = round(v * 1000, 1)
        print(json.dumps({k: results[k]}), flush=True)

    # --- A: breakdown-style (fx constant, reduced output) -----------------
    @jax.jit
    def fwd_a(m):
        out = model.apply(params, m, fx_const)
        return m + (jnp.sum(out["moved"]) + jnp.sum(out["warp"])).astype(m.dtype) * 0.0

    x = fwd_a(mov); float(jnp.sum(x))
    t0 = time.time()
    cur = mov
    for _ in range(3):
        cur = fwd_a(cur)
    float(jnp.sum(cur))
    report("A_breakdown_style_ms", (time.time() - t0) / 3)

    # --- C: fx as an argument, reduced output ------------------------------
    @jax.jit
    def fwd_c(m, f):
        out = model.apply(params, m, f)
        return m + (jnp.sum(out["moved"]) + jnp.sum(out["warp"])).astype(m.dtype) * 0.0

    x = fwd_c(mov, fx_const); float(jnp.sum(x))
    t0 = time.time()
    cur = mov
    for _ in range(3):
        cur = fwd_c(cur, fx_const)
    float(jnp.sum(cur))
    report("C_fx_as_arg_ms", (time.time() - t0) / 3)

    # --- B/D: bench-style (materialized outputs), iters 3 and 10 ----------
    @jax.jit
    def fwd_b(m, f):
        out = model.apply(params, m, f)
        return out["moved"], out["warp"]

    x, w = fwd_b(mov, fx_const); float(jnp.sum(w))
    for iters, key in ((3, "B_bench_style_iters3_ms"),
                       (10, "B_bench_style_iters10_ms")):
        t0 = time.time()
        cur = mov
        for _ in range(iters):
            cur, w = fwd_b(cur, fx_const)
        float(jnp.sum(cur) + jnp.sum(w))
        report(key, (time.time() - t0) / iters)

    print(json.dumps(results), flush=True)
    with open(__file__.replace(".py", "_results.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
