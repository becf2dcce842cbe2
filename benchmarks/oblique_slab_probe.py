"""TPU validation of the slabbed oblique device spline (round-5 item 5b).

At 192-scale the oblique sampler's gather source is far over the padded
-bytes cliff (192³ × 128 lanes × 4 B ≈ 3.6 GB), so before round 5 these
resamples fell back to host scipy. This probe runs the real-budget slab
path on the TPU and records:

  * correctness: max |device − scipy| on a mildly oblique map (the realistic
    NIfTI-header case: a few degrees of rotation),
  * the slab plan that engaged (chunk rows, slab planes),
  * warm device time vs host scipy time for the same resample.

Writes benchmarks/oblique_slab_results.json. Run on TPU (one process).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from multimodal_registration_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import numpy as np


def main():
    small = "--small" in sys.argv
    shape = (64, 48, 40) if small else (192, 192, 192)

    import jax

    if small:
        jax.config.update("jax_platforms", "cpu")

    from multimodal_registration_tpu.ops import resample as R

    rng = np.random.default_rng(0)
    vol = rng.normal(size=shape).astype(np.float32)
    th = np.deg2rad(4.0)
    c, s = np.cos(th), np.sin(th)
    M = np.eye(4)
    M[:2, :2] = [[c, -s], [s, c]]
    M[:3, 3] = [-1.5, 0.8, 0.3]
    out_shape = shape
    mode, cval, order, npad = "constant", 0.0, 3, 0

    budget = float(os.environ.get("MMREG_GATHER_SRC_BUDGET", 480e6))
    plan = R._oblique_slab_plan(M, out_shape, shape, order, mode, npad, budget)
    print(f"plan: {None if plan is None else (plan[0], plan[1], len(plan[2]))}")

    # device (slabbed on TPU by the real budget guard)
    t0 = time.time()
    dev = R._device_spline_resample(vol, M, out_shape, mode, cval, order)
    compile_and_first = time.time() - t0
    assert dev is not None, "device path did not engage"
    times = []
    for _ in range(3):
        t0 = time.time()
        dev = R._device_spline_resample(vol, M, out_shape, mode, cval, order)
        times.append(time.time() - t0)
    dev_s = min(times)

    # host scipy reference (also the pre-round-5 fallback cost)
    from scipy.ndimage import affine_transform

    t0 = time.time()
    ref = affine_transform(np.asarray(vol, np.float64), M[:3, :3],
                           offset=M[:3, 3], output_shape=out_shape,
                           order=order, mode=mode, cval=cval)
    host_s = time.time() - t0

    err = float(np.abs(dev - ref).max())
    res = {
        "shape": list(shape),
        "rotation_deg": 4.0,
        "plan_chunk_rows": None if plan is None else int(plan[0]),
        "plan_slab_planes": None if plan is None else int(plan[1]),
        "max_abs_err_vs_scipy": err,
        "device_s_warm": round(dev_s, 4),
        "device_s_first": round(compile_and_first, 2),
        "host_scipy_s": round(host_s, 3),
        "speedup_vs_host": round(host_s / dev_s, 2),
        "backend": jax.default_backend(),
    }
    print(json.dumps(res))
    assert err < 1e-3, f"slab path diverged from scipy: {err}"
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "oblique_slab_results.json")
    if not small:
        with open(out, "w") as f:
            json.dump(res, f, indent=1)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
