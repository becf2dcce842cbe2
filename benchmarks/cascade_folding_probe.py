"""Cascade folding attribution (VERDICT r3 directive #3).

The round-3 two-step artifact showed worst-subject folding of 1.55% in the
EXPORTED composed field (sub-02) while each step's field alone folds <=0.06%.
This probe reproduces that subject and attributes the folding:

  * ``int_compose``   — reference semantics: compose at the model's int-res
    grid, upsample the composed field (`bids_two_steps_registration.py:324`
    + `:515`). Cross-checked against a pure-numpy reimplementation of
    ``vxm.utils.compose`` (edge-clamped linear interpolation) to demonstrate
    the reference's own compose produces the same folding magnitude.
  * ``full_compose``  — upsample both step fields to the image grid first,
    compose there (the round-4 ``cascade_compose_res='full'`` default).
  * ``warp1_only`` / ``warp2_only`` — each step's upsampled field alone.

Folding is measured exactly like the evaluator: RAI-exported field, 5-point
stencil detJ (`eval_reg_with_jacobian.py:66-78`).

Usage:
  python benchmarks/cascade_folding_probe.py           # TPU, artifact subject
  python benchmarks/cascade_folding_probe.py --quick   # CPU smoke (tiny)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from multimodal_registration_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

HERE = os.path.dirname(os.path.abspath(__file__))
CKPT2 = os.path.join(HERE, "learned_ref_160x160x192_26lab.npz")  # fine
CKPT1 = os.path.join(HERE, "learned_model1_160x160x192_26lab.npz")  # smooth
RESULTS = os.path.join(HERE, "cascade_folding_results.json")


def numpy_compose(phi1, phi2):
    """Pure-numpy ``vxm.utils.compose`` semantics: phi2 + lin_interp(phi1) at
    (grid + phi2), edge-clamped — independent of our ops.warp implementation."""
    import numpy as np

    X, Y, Z, _ = phi1.shape
    grid = np.stack(
        np.meshgrid(np.arange(X), np.arange(Y), np.arange(Z), indexing="ij"), -1
    ).astype(np.float64)
    loc = grid + phi2
    maxs = np.array([X - 1, Y - 1, Z - 1], np.float64)
    loc = np.clip(loc, 0.0, maxs)
    l0 = np.floor(loc)
    w = loc - l0
    i0 = l0.astype(np.int64)
    i1 = np.minimum(i0 + 1, maxs.astype(np.int64))
    out = np.zeros_like(phi1, np.float64)
    for dx in (0, 1):
        wx = w[..., 0] if dx else 1 - w[..., 0]
        ix = i1[..., 0] if dx else i0[..., 0]
        for dy in (0, 1):
            wy = w[..., 1] if dy else 1 - w[..., 1]
            iy = i1[..., 1] if dy else i0[..., 1]
            for dz in (0, 1):
                wz = w[..., 2] if dz else 1 - w[..., 2]
                iz = i1[..., 2] if dz else i0[..., 2]
                out += phi1[ix, iy, iz] * (wx * wy * wz)[..., None]
    return phi2 + out


def export_fold(field):
    """Folding % of the RAI-exported field (identity/RAS affine: the export
    flips the first two components — `bids_registration.py:403-421`)."""
    import numpy as np

    from multimodal_registration_tpu.evalx.jacobian import folding_summary

    exported = field * np.array([-1.0, -1.0, 1.0], np.float32)
    s = folding_summary(exported)
    return round(s["percentage_negative_detJa"], 4)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--subject-idx", type=int, default=1, help="0-based; 1 = sub-02")
    args = ap.parse_args()

    if args.quick:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from learn_model1_workload import rigid_displace
    from multimodal_registration_tpu.infer.cascade import _compose_full_jit
    from multimodal_registration_tpu.infer.config import InferenceConfig
    from multimodal_registration_tpu.infer.register import Registrar, load_params_any
    from multimodal_registration_tpu.ops.field import compose_fields
    from multimodal_registration_tpu.ops.resize import rescale_field
    from multimodal_registration_tpu.synth.image_engine import labels_to_image
    from multimodal_registration_tpu.synth.labelmaps import generate_label_maps
    from multimodal_registration_tpu.train.config import TrainConfig
    from multimodal_registration_tpu.train.trainer import Trainer

    if args.quick:
        shape, num_labels = (48, 48, 48), 8
        tcfg = TrainConfig.from_dict(dict(
            in_shape=list(shape), num_labels=num_labels, num_maps=2,
            im_scales=[8], def_scales=[8], enc=[4] * 4, dec=[4] * 6,
            compute_dtype="float32", epochs=1,
        ))
        cfg = InferenceConfig.from_dict(dict(enc=[4] * 4, dec=[4] * 6,
                                             compute_dtype="float32"))
        import tempfile

        from multimodal_registration_tpu.models.vxm_dense import (
            VxmConfig, params_template)
        from multimodal_registration_tpu.train.trainer import _flatten_params

        wdir = tempfile.mkdtemp()
        m1 = m2 = os.path.join(wdir, "w.npz")
        np.savez(m1, **_flatten_params(params_template(
            VxmConfig(enc=(4,) * 4, dec=(4,) * 6, compute_dtype="float32"))))
    else:
        shape, num_labels = (160, 160, 192), 26
        tcfg = TrainConfig.from_dict(dict(
            in_shape=list(shape), num_labels=num_labels, num_maps=2,
            batch_size=1, epochs=1,
        ))
        cfg = InferenceConfig.from_dict(dict(
            enc=list(tcfg.enc), dec=list(tcfg.dec), int_steps=tcfg.int_steps,
            int_res=tcfg.int_res, svf_res=tcfg.svf_res,
        ))
        m1, m2 = CKPT1, CKPT2

    engine_cfg = Trainer(tcfg).engine_cfg

    # the artifact's subject construction (twostep_parity_run.py: maps seed
    # 888, per-image keys 9000+2i/9000+2i+1, rigid displacement seed 500+i)
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
    mov, _ = rigid_displace(mov, np.zeros_like(mov), 500 + i)

    # min-max scale like preprocess (identity grids: no resampling)
    fx = (fx - fx.min()) / max(fx.max() - fx.min(), 1e-9)
    mov = (mov - mov.min()) / max(mov.max() - mov.min(), 1e-9)

    reg1 = Registrar(cfg, load_params_any(m1, cfg))
    reg2 = Registrar(cfg, load_params_any(m2, cfg))
    moved1_b, warp1_b = reg1.predict(mov[None], fx[None])
    _, warp2_b = reg2.predict(moved1_b[0][None], fx[None])
    warp1, warp2 = warp1_b[0], warp2_b[0]
    scale = 1 if warp1.shape[0] == shape[0] else 2
    full_shape = tuple(shape)

    up = lambda w: np.asarray(
        rescale_field(jnp.asarray(w), scale, out_shape=full_shape)
    ) if scale != 1 else np.asarray(w)

    # (a) reference semantics: int-res compose, then upsample
    comp_int = np.asarray(compose_fields(jnp.asarray(warp1), jnp.asarray(warp2)))
    comp_int_full = up(comp_int)
    # numpy cross-check of the reference's own compose math at int res
    comp_int_np = numpy_compose(
        np.asarray(warp1, np.float64), np.asarray(warp2, np.float64)
    ).astype(np.float32)
    comp_int_np_full = up(comp_int_np)
    # (b) full-res compose
    comp_full = np.asarray(_compose_full_jit(
        jnp.asarray(warp1), jnp.asarray(warp2), scale, full_shape))

    out = {
        "workload": f"{shape}/{num_labels} labels, subject idx {i} (sub-{i+1:02d}), "
                    f"rigid-displaced moving",
        "checkpoints": {"model1": os.path.basename(m1), "model2": os.path.basename(m2)},
        "mean_abs_flow_vox": {
            "warp1(at int-res grid)": round(float(np.abs(warp1).mean()), 3),
            "warp2(at int-res grid)": round(float(np.abs(warp2).mean()), 3),
        },
        # `up` = rescale_field: upsample AND scale vectors to full-res units
        "folding_pct_exported": {
            "warp1_only": export_fold(up(warp1)),
            "warp2_only": export_fold(up(warp2)),
            "int_compose(reference semantics)": export_fold(comp_int_full),
            "int_compose_numpy_vxm_check": export_fold(comp_int_np_full),
            "full_compose(round-4 default)": export_fold(comp_full),
        },
    }
    with open(RESULTS if not args.quick else RESULTS + ".quick", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
