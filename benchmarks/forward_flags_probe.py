"""TPU probe: flagship forward under the round-3 kernel flags.

Times the full VxmDense forward (enc 64x4 / dec 64x6, int 5, svf/int res 2,
bf16) at 192^3 for each combination of:
  * MMREG_FUSED_FIRST_CONV — fused conv+pool Pallas kernel,
  * MMREG_ZLINE_MODEL — z-line row-reduction integration/moved warps,
and checks output agreement vs the baseline path. Run on hardware only.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from multimodal_registration_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_registration_tpu.models.vxm_dense import VxmConfig, VxmDense, init_params

SHAPE = (192, 192, 192)


def drain(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def main():
    cfg = VxmConfig(enc=(64,) * 4, dec=(64,) * 6, int_steps=5, int_res=2,
                    svf_res=2, compute_dtype="bfloat16")
    model = VxmDense(cfg=cfg)
    params = init_params(cfg, inshape=(32, 32, 32))
    rng = np.random.default_rng(0)
    mov = jnp.asarray(rng.random((1, *SHAPE, 1), dtype=np.float32))
    fx = jnp.asarray(rng.random((1, *SHAPE, 1), dtype=np.float32))

    results = {}
    base_out = None
    for fuse in ("0", "1"):
        for zline in ("0", "1"):
            os.environ["MMREG_FUSED_FIRST_CONV"] = fuse
            os.environ["MMREG_ZLINE_MODEL"] = zline
            tag = f"fuse{fuse}_zline{zline}"
            try:
                fwd = jax.jit(lambda p, m, f: model.apply(p, m, f)["moved"])
                out = fwd(params, mov, fx)
                drain(out)
                t0 = time.time()
                x = mov
                for _ in range(10):
                    x = fwd(params, x, fx)  # "moved" keeps (1,X,Y,Z,1): chainable
                drain(x)
                ms = (time.time() - t0) / 10 * 1000
                results[f"{tag}_ms"] = round(ms, 1)
                results[f"{tag}_pairs_per_sec"] = round(1000.0 / ms, 3)
                if base_out is None:
                    base_out = np.asarray(fwd(params, mov, fx), np.float32)
                else:
                    err = float(np.max(np.abs(
                        np.asarray(fwd(params, mov, fx), np.float32) - base_out)))
                    results[f"{tag}_maxerr_vs_base"] = round(err, 5)
            except Exception as e:  # noqa: BLE001 - probe records failures
                results[f"{tag}_error"] = str(e)[:300]
    os.environ.pop("MMREG_FUSED_FIRST_CONV", None)
    os.environ.pop("MMREG_ZLINE_MODEL", None)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
