"""Step-1 SVF smoothing sweep for the two-step cascade (VERDICT r3 #3 cont.).

``cascade_folding_probe.py`` attributed the composed-field folding to step-1's
OWN exported warp (1.49% self-fold on the worst subject; the compose math is
not the culprit — a numpy VoxelMorph-semantics cross-check matches exactly),
and integration levers (f32 payload, more int steps, full-res exponentiation)
were measured not to help: the folding is in the *SVF itself* — the smooth
model's raw half-res flow has sub-grid oscillations whose linear upsample
folds. The remaining inference-time lever is smoothing the SVF before
integration (any C1 SVF integrates to a diffeomorphism; smoothing attacks the
roughness at its source).

This sweep applies a BORDER-RENORMALIZED separable Gaussian (sigma in voxels
at the SVF grid) to step-1's SVF, re-integrates, re-runs step 2 on the
re-warped moving volume, and reports per sigma:

  * step-1-only exported folding,
  * composed folding under both ``cascade_compose_res`` modes ('int' =
    reference semantics, 'full' = image-grid compose),
  * a threshold-segmentation Dice proxy (percentile 98.4, the parity
    artifact's ThresholdSegmenter setting) of the two-step moved vs fixed —
    the guard that smoothing does not cost registration quality.

Usage:
  python benchmarks/cascade_smoothing_sweep.py            # CPU (f32 math)
  python benchmarks/cascade_smoothing_sweep.py --subject-idx 1
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HERE = os.path.dirname(os.path.abspath(__file__))
CKPT2 = os.path.join(HERE, "learned_ref_160x160x192_26lab.npz")  # fine
CKPT1 = os.path.join(HERE, "learned_model1_160x160x192_26lab.npz")  # smooth
RESULTS = os.path.join(HERE, "cascade_smoothing_sweep.json")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subject-idx", type=int, default=1, help="0-based; 1 = sub-02")
    ap.add_argument("--sigmas", type=float, nargs="+",
                    default=[0.0, 0.5, 1.0, 1.5, 2.0, 3.0])
    ap.add_argument("--tpu", action="store_true",
                    help="run on the default (TPU) backend; default is CPU")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from cascade_folding_probe import export_fold
    from learn_model1_workload import rigid_displace
    from multimodal_registration_tpu.infer.config import InferenceConfig
    from multimodal_registration_tpu.infer.register import Registrar, load_params_any
    from multimodal_registration_tpu.ops.field import compose_fields
    from multimodal_registration_tpu.ops.integrate import integrate_svf
    from multimodal_registration_tpu.ops.resize import rescale_field
    from multimodal_registration_tpu.ops.warp import warp
    from multimodal_registration_tpu.synth.image_engine import labels_to_image
    from multimodal_registration_tpu.synth.labelmaps import generate_label_maps
    from multimodal_registration_tpu.train.config import TrainConfig
    from multimodal_registration_tpu.train.trainer import Trainer

    shape, num_labels = (160, 160, 192), 26
    tcfg = TrainConfig.from_dict(dict(
        in_shape=list(shape), num_labels=num_labels, num_maps=2,
        batch_size=1, epochs=1,
    ))
    cfg = InferenceConfig.from_dict(dict(
        enc=list(tcfg.enc), dec=list(tcfg.dec), int_steps=tcfg.int_steps,
        int_res=tcfg.int_res, svf_res=tcfg.svf_res,
        compute_dtype="float32" if not args.tpu else "bfloat16",
    ))
    engine_cfg = Trainer(tcfg).engine_cfg

    # identical subject construction to cascade_folding_probe.py
    i = args.subject_idx
    maps = generate_label_maps(
        jax.random.PRNGKey(888), i + 1, shape, num_labels,
        im_scales=tcfg.im_scales, def_scales=tcfg.def_scales,
    )
    lab = jnp.asarray(np.asarray(maps[i]))
    fx_img, _ = labels_to_image(jax.random.PRNGKey(9000 + 2 * i), lab, engine_cfg)
    mv_img, _ = labels_to_image(jax.random.PRNGKey(9000 + 2 * i + 1), lab, engine_cfg)
    fx = np.asarray(fx_img, np.float32)
    mov = np.asarray(mv_img, np.float32)
    lab_np = np.asarray(lab)
    mov, mov_lab = rigid_displace(mov, lab_np, 500 + i)
    fx = (fx - fx.min()) / max(fx.max() - fx.min(), 1e-9)
    mov = (mov - mov.min()) / max(mov.max() - mov.min(), 1e-9)

    reg1 = Registrar(cfg, load_params_any(CKPT1, cfg))
    reg2 = Registrar(cfg, load_params_any(CKPT2, cfg))

    # step-1 SVF once (sigma-independent): the model's raw half-res flow
    svf1 = np.asarray(jax.jit(
        lambda p, m, f: reg1.model.apply(p, m, f)["svf"]
    )(reg1.params, jnp.asarray(mov)[None, ..., None],
      jnp.asarray(fx)[None, ..., None]))[0]

    radius = 9  # static kernel width; covers sigma <= 3 (tail < 1e-4)

    from functools import partial

    from multimodal_registration_tpu.ops.field import smooth_field

    @partial(jax.jit, static_argnums=1)
    def smooth_integrate(svf, sigma):
        """The PRODUCTION smoothing (ops/field.smooth_field — the exact code
        VxmConfig.svf_smooth_sigma runs), then integrate. One jit per swept
        sigma (static), so the artifact can't drift from the shipped op."""
        sm = smooth_field(svf, sigma, radius=radius)
        return integrate_svf(sm, cfg.int_steps,
                             payload_dtype=None if not args.tpu else jnp.bfloat16)

    full_shape = tuple(shape)

    @jax.jit
    def moved_from(warp1):
        w1f = rescale_field(warp1, 2, out_shape=full_shape)
        return warp(jnp.asarray(mov), w1f, interp="linear")

    @jax.jit
    def compose_int(w1, w2):
        return compose_fields(w1, w2)

    @jax.jit
    def compose_full(w1, w2):
        w1f = rescale_field(w1, 2, out_shape=full_shape)
        w2f = rescale_field(w2, 2, out_shape=full_shape)
        return compose_fields(w1f, w2f)

    up = jax.jit(lambda w: rescale_field(w, 2, out_shape=full_shape))

    warp_nearest = jax.jit(lambda v, f: warp(v, f, interp="nearest"))

    def label_dice(field_fullres):
        """Mean Dice over non-background labels: the displaced moving label
        map warped (nearest) by the candidate full-res field, vs the fixed
        subject's own label map — the sweep's quality guard."""
        moved_lab = np.asarray(
            warp_nearest(jnp.asarray(mov_lab, jnp.float32),
                         jnp.asarray(field_fullres))
        ).round().astype(np.int32)
        ds = []
        for l in range(1, num_labels):
            a = moved_lab == l
            b = lab_np == l
            denom = float(a.sum() + b.sum())
            if denom == 0:
                continue
            ds.append(2 * float(np.logical_and(a, b).sum()) / denom)
        return round(float(np.mean(ds)), 4)

    def interior_fold(field_fullres, margin=16):
        """Folding % excluding a `margin`-voxel border (is the folding an
        edge effect or in the bulk?)."""
        from multimodal_registration_tpu.evalx.jacobian import folding_summary

        f = np.asarray(field_fullres) * np.array([-1.0, -1.0, 1.0], np.float32)
        m = margin
        s = folding_summary(f[m:-m, m:-m, m:-m])
        return round(s["percentage_negative_detJa"], 4)

    rows = []
    for sigma in args.sigmas:
        w1 = smooth_integrate(jnp.asarray(svf1), float(sigma))
        moved1 = moved_from(w1)
        moved2_b, w2_b = reg2.predict(np.asarray(moved1)[None], fx[None])
        w2 = jnp.asarray(w2_b[0])
        ci = compose_int(w1, w2)
        cf = compose_full(w1, w2)
        w1_full = np.asarray(up(w1))
        ci_full = np.asarray(up(ci))
        row = {
            "sigma_vox_at_svf_grid": sigma,
            "mean_abs_warp1_vox": round(float(jnp.abs(w1).mean()), 3),
            "fold_warp1_only": export_fold(w1_full),
            "fold_warp1_interior16": interior_fold(w1_full),
            "fold_int_compose": export_fold(ci_full),
            "fold_int_compose_interior16": interior_fold(ci_full),
            "fold_full_compose": export_fold(np.asarray(cf)),
            "dice_int_compose": label_dice(ci_full),
            "dice_full_compose": label_dice(np.asarray(cf)),
            "dice_step1_only": label_dice(w1_full),
        }
        rows.append(row)
        print(json.dumps(row))

    out = {
        "workload": f"{shape}/{num_labels} labels, subject idx {i} "
                    f"(sub-{i + 1:02d}), rigid-displaced moving",
        "backend": "tpu" if args.tpu else "cpu-f32",
        "checkpoints": {"model1": os.path.basename(CKPT1),
                        "model2": os.path.basename(CKPT2)},
        "blur": f"border-renormalized separable Gaussian, radius {radius}",
        "rows": rows,
    }
    with open(RESULTS, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", RESULTS)


if __name__ == "__main__":
    main()
