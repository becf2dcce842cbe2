"""Multi-chip inference throughput: registered pairs/s over the ``data`` mesh
axis (VERDICT r2 item 4: the scale-out number for the user-facing sharded
path).

On real multi-chip hardware this produces the v5e-8 headline (batch = number
of chips, one pair per chip — PERF.md measured batching>1 per chip degrades
throughput, so scale-out rides the ``data`` axis). Today only one TPU chip is
reachable, so by default this runs CORRECTNESS + scaling shape on a virtual
8-device CPU mesh (``--virtual 8``) and prints per-layout timings; the same
script unchanged gives real numbers once `jax.devices()` shows N chips.

Usage:
  python benchmarks/multichip_bench.py              # real devices
  python benchmarks/multichip_bench.py --virtual 8  # 8 virtual CPU devices
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--virtual", type=int, default=0,
                   help="force N virtual CPU devices (correctness mode)")
    p.add_argument("--shape", type=int, nargs=3, default=None,
                   help="volume shape (default 192^3 real / 32^3 virtual)")
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args()

    if args.virtual:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={args.virtual}"
            ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        from multimodal_registration_tpu.utils.jaxcache import enable_persistent_cache

        enable_persistent_cache()
        import jax

    import numpy as np

    from multimodal_registration_tpu.infer.config import InferenceConfig
    from multimodal_registration_tpu.infer.register import Registrar
    from multimodal_registration_tpu.infer.sharded import ShardedRegistrar
    from multimodal_registration_tpu.parallel.mesh import make_mesh

    n = len(jax.devices())
    virtual = bool(args.virtual) or jax.default_backend() == "cpu"
    shape = tuple(args.shape) if args.shape else ((32, 32, 32) if virtual else (192, 192, 192))
    # flagship architecture on hardware; thin on the virtual correctness mesh
    width = 4 if virtual else 64
    cfg = InferenceConfig.from_dict(dict(
        enc=[width] * 4, dec=[width] * 6,
        compute_dtype="float32" if virtual else "bfloat16",
    ))
    from multimodal_registration_tpu.models.vxm_dense import VxmConfig, init_params

    params = init_params(
        VxmConfig(enc=tuple(cfg.enc), dec=tuple(cfg.dec),
                  compute_dtype=cfg.compute_dtype),
        inshape=(32, 32, 32),
    )

    rng = np.random.default_rng(0)
    results = {"devices": n, "backend": jax.default_backend(), "shape": list(shape)}

    def timed_pairs_per_sec(reg, batch):
        mov = rng.random((batch, *shape), dtype=np.float32)
        fx = rng.random((batch, *shape), dtype=np.float32)
        reg.predict(mov, fx)  # compile + warm
        t0 = time.time()
        for _ in range(args.iters):
            out = reg.predict(mov, fx)
        dt = (time.time() - t0) / args.iters
        return batch / dt, out

    # single chip, batch 1 (the per-chip baseline)
    single = Registrar(cfg, params)
    base_pps, base_out = timed_pairs_per_sec(single, 1)
    results["single_chip_pairs_per_sec"] = round(base_pps, 4)

    # data-parallel scale-out: one pair per chip over the `data` axis
    mesh = make_mesh(n)
    dp = ShardedRegistrar(cfg, params, mesh)
    dp_pps, dp_out = timed_pairs_per_sec(dp, n)
    results["data_parallel"] = {
        "chips": n, "pairs_per_sec": round(dp_pps, 4),
        "scaling_efficiency_vs_single": round(dp_pps / (base_pps * n), 4),
    }

    # correctness: DP outputs must equal the single-chip forward per pair
    mov = rng.random((n, *shape), dtype=np.float32)
    fx = rng.random((n, *shape), dtype=np.float32)
    m_dp, w_dp = dp.predict(mov, fx)
    m_1, w_1 = single.predict(mov, fx)
    err = float(np.max(np.abs(m_dp - m_1)))
    tol = 1e-4 if cfg.compute_dtype == "float32" else 5e-2
    assert err <= tol, f"DP forward deviates from single-chip: max err {err}"
    results["dp_equals_single_chip_max_err"] = err

    # spatially sharded layout (space=2) when the mesh allows it
    if n % 2 == 0:
        sp = ShardedRegistrar(cfg, params, make_mesh(n, space=2))
        sp_pps, _ = timed_pairs_per_sec(sp, n // 2)
        m_sp, w_sp = sp.predict(mov[: n // 2], fx[: n // 2])
        err_sp = float(np.max(np.abs(m_sp - m_1[: n // 2])))
        assert err_sp <= tol, f"space-sharded forward deviates: {err_sp}"
        results["space2"] = {
            "pairs_per_sec": round(sp_pps, 4),
            "equals_single_chip_max_err": err_sp,
        }

    results["mode"] = "virtual-correctness" if virtual else "hardware"
    print(json.dumps(results))


if __name__ == "__main__":
    main()
