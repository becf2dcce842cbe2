"""Exact forward decomposition at 192^3 (output-DCE ablation).

Times nested prefixes of the REAL VxmDense graph (not proxies): U-Net convs →
+flow head → +integration → +full-res rescale → +moved warp → full model.
Differences between consecutive rows attribute the wall time. Chained async
dispatch with scalar-readback drain.

``--arch train`` (default) is the flagship training net (enc 64); ``--arch
infer256`` is the published inference architecture (enc [256]x4 / dec
[256]x6, `/root/reference/config/config_inference.json:8-9`).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from multimodal_registration_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from multimodal_registration_tpu.models.vxm_dense import VxmConfig, VxmDense, init_params


def timed_chain(fn, x, iters):
    y = fn(x)
    float(jnp.sum(y))
    t0 = time.time()
    cur = x
    for _ in range(iters):
        # data dependence on the previous result keeps the dispatch chained
        cur = fn(cur)
    float(jnp.sum(cur))
    return (time.time() - t0) / iters


def main(shape=(192, 192, 192), width=64, iters=8):
    cfg = VxmConfig(enc=(width,) * 4, dec=(width,) * 6, int_steps=5, int_res=2,
                    svf_res=2, compute_dtype="bfloat16")
    model = VxmDense(cfg=cfg)
    params = init_params(cfg, inshape=(32, 32, 32))
    fx = jnp.zeros((1, *shape, 1), jnp.float32)

    outputs = ["svf", "warp", "flow_fullres", "moved"]
    results = {}
    for out_key in outputs:
        @jax.jit
        def fwd(mov, _k=out_key):
            out = model.apply(params, mov, fx)
            r = out[_k]
            # reduce to the input shape so the chain can feed back
            return mov + jnp.sum(r).astype(mov.dtype) * 0.0

        results[f"upto_{out_key}_ms"] = round(timed_chain(fwd, fx, iters) * 1000, 1)
        print(json.dumps({f"upto_{out_key}_ms": results[f"upto_{out_key}_ms"]}), flush=True)

    @jax.jit
    def full(mov):
        out = model.apply(params, mov, fx)
        return mov + (jnp.sum(out["moved"]) + jnp.sum(out["warp"])).astype(mov.dtype) * 0.0

    results["full_predict_ms"] = round(timed_chain(full, fx, iters) * 1000, 1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", choices=("train", "infer256"), default="train")
    ap.add_argument("--iters", type=int, default=0, help="0 = per-arch default")
    a = ap.parse_args()
    width = 64 if a.arch == "train" else 256
    iters = a.iters or (8 if a.arch == "train" else 3)
    main(width=width, iters=iters)
