"""Train-step SPEED-OF-LIGHT itemization (VERDICT r4 directive 3).

Gives the TRAINING step the same treatment the forward got (PERF.md
"Speed-of-light accounting"): every synthesis stage and the backward's big
blocks timed in isolation at the reference workload (160x160x192, 26 labels,
`config/config.json:14-16,29-31`), each next to an ANALYTIC floor at this
chip's empirically measured engine rates:

  * HBM stream          ~185 GB/s  (pool-kernel probe, PERF.md round 3c)
  * packed-gather rows  0.14-0.23 G rows/s (warp probes, round 2/3)
  * XLA Conv3D          10-16% of bf16 peak at 64ch (conv probe, round 2b)

Isolated stage timings slightly UNDER-count fused overlap (XLA melts
elementwise stages into neighbors), so stage sums can exceed in-graph
attribution (train_breakdown) — both views are printed. Chained-key dispatch,
scalar-readback drain, best-of-blocks (fresh-compile process pollution,
PERF.md round 4b).

Usage: train_sol.py [--small] [--iters N]
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


def timed(fn, *args, iters=8, blocks=2, key_pos=None):
    """sec/iter, best block; chained PRNG key when key_pos given."""
    args = list(args)
    out = fn(*args)
    for leaf in jax.tree_util.tree_leaves(out):
        float(jnp.sum(jnp.abs(leaf.astype(jnp.float32))))
    best = None
    for _ in range(blocks):
        t0 = time.time()
        key = args[key_pos] if key_pos is not None else None
        for _ in range(iters):
            if key_pos is not None:
                key, sub = jax.random.split(key)
                args[key_pos] = sub
            out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(jnp.abs(leaf.astype(jnp.float32))))
        dt = (time.time() - t0) / iters
        best = dt if best is None else min(best, dt)
    return best


GB = 1e9
STREAM = 185e9          # B/s effective HBM (measured, round 3c)
ROW_RATE_SMALL = 0.14e9  # packed-gather rows/s, small sources (integrate)
ROW_RATE_BIG = 0.23e9    # packed-gather rows/s, big slabbed sources


def main():
    small = "--small" in sys.argv
    iters = 8
    if "--iters" in sys.argv:
        iters = int(sys.argv[sys.argv.index("--iters") + 1])

    if small:
        shape, L = (32, 32, 48), 8
    else:
        shape, L = (160, 160, 192), 26

    from multimodal_registration_tpu.ops.integrate import integrate_svf
    from multimodal_registration_tpu.ops.resize import rescale_field
    from multimodal_registration_tpu.ops.warp import warp_labels_soft_hard
    from multimodal_registration_tpu.synth.image_engine import (
        ImageEngineConfig,
        _gaussian_blur,
    )
    from multimodal_registration_tpu.synth.perlin import draw_perlin

    ecfg = ImageEngineConfig(num_labels=L, svf_int_res=4)
    r = ecfg.svf_int_res
    small_grid = tuple(s // r for s in shape)
    V = int(np.prod(shape))
    Vs = int(np.prod(small_grid))
    rng = np.random.RandomState(0)
    lab = jnp.asarray(rng.randint(0, L, shape), jnp.int32)
    key = jax.random.PRNGKey(0)

    rows = []  # (name, ms, floor_ms, floor_kind)

    def add(name, sec, floor_s, kind):
        rows.append((name, sec * 1e3, floor_s * 1e3, kind))

    # --- synthesis stages (per IMAGE; one step synthesizes 2) ---------------
    scales = [float(s) / r for s in (ecfg.vel_res if isinstance(ecfg.vel_res, tuple) else (ecfg.vel_res,))]

    f_draw = jax.jit(lambda k: draw_perlin(k, (*small_grid, 3), scales,
                                           max_std=ecfg.vel_std))
    t = timed(f_draw, key, key_pos=0, iters=iters)
    # floor: perlin draws noise at shape/scale then linearly upsamples ->
    # write 3V_s f32 + upsample reads/writes ~2x
    add("svf draw (perlin, /4 grid)", t, (9 * Vs * 4) / STREAM, "stream")

    svf = f_draw(key)
    pd = jnp.dtype(ecfg.integrate_payload_dtype)
    f_int = jax.jit(lambda v: integrate_svf(v / r, ecfg.int_steps, payload_dtype=pd))
    t = timed(f_int, svf, iters=iters)
    add("svf integrate (5 sq, /4 grid)", t,
        ecfg.int_steps * Vs / ROW_RATE_SMALL, "gather rows")

    phi_s = f_int(svf)
    f_up = jax.jit(lambda v: rescale_field(v, float(r), out_shape=shape))
    t = timed(f_up, phi_s, iters=iters)
    add("phi upsample /4 -> full", t, (3 * (Vs + V) * 4) / STREAM, "stream")

    phi = f_up(phi_s)
    f_warp = jax.jit(lambda p: warp_labels_soft_hard(lab, p, L))
    t = timed(f_warp, phi, iters=iters)
    # floor: V int8-packed rows gathered + pack writes (8V int8) + one-hot mix
    add("label warp (soft+hard, packed)", t, V / ROW_RATE_BIG, "gather rows")

    _, lab_idx = f_warp(phi)

    def f_lookup(k, li):
        k_mean, k_std, k_noise = jax.random.split(k, 3)
        means = jax.random.uniform(k_mean, (L,), minval=25.0, maxval=225.0)
        stds = jax.random.uniform(k_std, (L,), minval=5.0, maxval=25.0)
        m = jnp.full(shape, means[0], jnp.float32)
        s = jnp.full(shape, stds[0], jnp.float32)
        for l in range(1, L):
            sel = li == l
            m = jnp.where(sel, means[l], m)
            s = jnp.where(sel, stds[l], s)
        return m + s * jax.random.normal(k_noise, shape)

    f_lookup_j = jax.jit(f_lookup)
    t = timed(f_lookup_j, key, lab_idx, key_pos=0, iters=iters)
    # floor: L select passes read lab_idx(i32)+2 running tables -> ~L*3 V f32
    # fused on the VPU; stream bound on ~(L+4) V reads
    add(f"intensity lookup ({L}-way select)+noise", t,
        ((L + 4) * V * 4) / STREAM, "stream")

    img = f_lookup_j(key, lab_idx)
    f_blur = jax.jit(lambda im, k: _gaussian_blur(
        im, jax.random.uniform(k, (), maxval=ecfg.blur_std), ecfg.blur_radius))
    t = timed(f_blur, img, key, key_pos=1, iters=iters)
    add("blur (shifts, r=3, 3 axes)", t, (3 * 2 * V * 4) / STREAM, "stream")

    f_bias = jax.jit(lambda im, k: im * jnp.exp(
        draw_perlin(k, (*shape, 1), [ecfg.bias_res], max_std=ecfg.bias_std)[..., 0]))
    t = timed(f_bias, img, key, key_pos=1, iters=iters)
    add("bias field (perlin+exp+mul)", t, (3 * V * 4) / STREAM, "stream")

    def f_norm_gamma(im, k):
        lo, hi = jnp.min(im), jnp.max(im)
        im = (im - lo) / jnp.maximum(hi - lo, 1e-7)
        g = jnp.exp(0.25 * jax.random.normal(k, ()))
        return jnp.power(jnp.clip(im, 1e-7, 1.0), g)

    f_ng = jax.jit(f_norm_gamma)
    t = timed(f_ng, img, key, key_pos=1, iters=iters)
    add("min-max norm + gamma pow", t, (4 * V * 4) / STREAM, "stream")

    from multimodal_registration_tpu.synth.augment import random_flips

    f_flip = jax.jit(lambda k, a, b: random_flips(k, (a, b)))
    t = timed(f_flip, key, img, img, key_pos=0, iters=iters)
    add("random flips (pair)", t, (4 * V * 4) / STREAM, "stream")

    # --- backward blocks (fresh re-run of round-3b attribution) -------------
    from multimodal_registration_tpu.models.vxm_dense import (
        VxmConfig, VxmDense, init_params,
    )

    vcfg = VxmConfig(enc=(64,) * 4, dec=(64,) * 6, int_steps=5, int_res=2,
                     svf_res=2,
                     compute_dtype="float32" if small else "bfloat16")
    model = VxmDense(cfg=vcfg)
    params = init_params(vcfg, inshape=(16, 16, 16))
    mov = jnp.asarray(rng.rand(1, *shape, 1), jnp.float32)
    fx = jnp.asarray(rng.rand(1, *shape, 1), jnp.float32)

    f_fwd = jax.jit(lambda p, m, f: jnp.sum(model.apply(p, m, f)["warp"] ** 2))
    f_bwd = jax.jit(jax.grad(lambda p, m, f: jnp.sum(
        model.apply(p, m, f)["warp"] ** 2)))
    t_f = timed(f_fwd, params, mov, fx, iters=max(2, iters // 2))
    t_b = timed(f_bwd, params, mov, fx, iters=max(2, iters // 2))
    # conv floor: measured XLA Conv3D MFU band at 64ch; bwd ~2x fwd FLOPs
    add("model fwd (U-Net+int, to warp)", t_f, 0.0, "see fwd SoL table")
    add("model fwd+bwd (grad wrt params)", t_b, 0.0, "convs ~2-3x fwd floor")

    # --- report --------------------------------------------------------------
    print(f"\nworkload {shape} / {L} labels, svf_int_res={r}  "
          f"(per-image synthesis stages; a step synthesizes 2 images)\n")
    print(f"{'stage':44s} {'measured':>10s} {'floor':>9s}  floor kind")
    for name, ms, fms, kind in rows:
        fl = f"{fms:8.2f}" if fms else "      - "
        print(f"{name:44s} {ms:8.2f}ms {fl}ms  {kind}")
    out = {
        "workload": list(shape), "labels": L, "svf_int_res": r,
        "rows": [
            {"stage": n, "ms": round(m, 3), "floor_ms": round(f, 3),
             "floor": k} for n, m, f, k in rows
        ],
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "train_sol_results.json")
    if not small:
        with open(path, "w") as fjs:
            json.dump(out, fjs, indent=1)
        print(f"\nwrote {path}")


if __name__ == "__main__":
    main()
