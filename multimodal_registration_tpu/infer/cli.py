"""Inference CLIs — drop-in equivalents of the reference entry points:

  * ``pair_registration``      ← `3d_reg.py:428-461` (standalone pair)
  * ``bids_registration``      ← `bids_registration.py:444-474`
  * ``bids_two_steps``         ← `bids_two_steps_registration.py` CLI
  * ``gen_apply_def_field``    ← `gen_apply_def_field.py:19-80`

The reference's ``--one-cpu-tf`` flag (pinning TF to one CPU so
``sct_run_batch -jobs N`` processes don't oversubscribe,
`bids_registration.py:460-472`) maps here to capping XLA host threads.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from multimodal_registration_tpu.onecpu import apply_one_cpu_env
from multimodal_registration_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

from multimodal_registration_tpu.infer.cascade import register_two_steps
from multimodal_registration_tpu.infer.config import InferenceConfig
from multimodal_registration_tpu.infer.register import load_params_any, register
from multimodal_registration_tpu.infer.sharded import make_registrar
from multimodal_registration_tpu.models.quantize import sidecar_kwargs
from multimodal_registration_tpu.utils import io as vio
from multimodal_registration_tpu.utils import nifti


def _bool_flag(s: str) -> bool:
    return str(s).lower() in ("1", "true", "yes")


def _add_sharding_flags(p: argparse.ArgumentParser):
    p.add_argument("--space", type=int, default=None,
                   help="shard the volume X-axis over N chips (multi-chip "
                        "inference; overrides the config's sharding.space)")
    p.add_argument("--data-shard", type=int, default=None,
                   help="shard the batch axis over N chips (overrides the "
                        "config's sharding.data)")


def _apply_sharding_flags(cfg: InferenceConfig, args):
    if getattr(args, "space", None):
        cfg.sharding = {**cfg.sharding, "space": args.space}
    if getattr(args, "data_shard", None):
        cfg.sharding = {**cfg.sharding, "data": args.data_shard}


def _maybe_one_cpu(flag: str):
    """Best-effort one-cpu pinning for console-script entry points.

    The root shims (``3d_reg.py`` etc.) apply this BEFORE importing this
    module; here it still lands before the first backend client is created
    (XLA reads XLA_FLAGS at client creation, not at ``import jax``)."""
    if _bool_flag(flag):
        apply_one_cpu_env(["--one-cpu-tf", "True"])


def pair_registration(argv=None):
    p = argparse.ArgumentParser(description="Register a pair of 3-D volumes (3d_reg parity).")
    p.add_argument("--model-path", required=True)
    p.add_argument("--config-path", required=True)
    p.add_argument("--fx-img-path", required=True)
    p.add_argument("--mov-img-path", required=True)
    p.add_argument("--fx-img-contrast", default="T1w")
    p.add_argument("--res-dir", default="res")
    p.add_argument("--out-img-name", default="warped_im")
    p.add_argument("--def-field-name", default="deform_field")
    p.add_argument("--warp-interp", default=None,
                   help="override warp interpolation (linear/nearest), 3d_reg.py:443 parity")
    p.add_argument("--resample-interp", default=None,
                   help="override resample interpolation (linear/nearest/spline)")
    p.add_argument("--one-cpu-tf", default="True")
    _add_sharding_flags(p)
    args = p.parse_args(argv)
    _maybe_one_cpu(args.one_cpu_tf)

    cfg = InferenceConfig.from_json(args.config_path)
    if args.warp_interp:
        cfg.warp_interpolation = args.warp_interp
    if args.resample_interp:
        cfg.resample_interpolation = args.resample_interp
    _apply_sharding_flags(cfg, args)
    params = load_params_any(args.model_path, cfg)
    reg = make_registrar(cfg, params, **sidecar_kwargs(args.model_path, cfg))
    return register(
        cfg,
        reg,
        args.fx_img_path,
        args.mov_img_path,
        fx_contrast=args.fx_img_contrast,
        naming="standalone",
        res_dir=args.res_dir,
        out_im_name=args.out_img_name,
        out_field_name=args.def_field_name,
    )


def bids_registration(argv=None):
    p = argparse.ArgumentParser(description="BIDS single-model registration (bids_registration parity).")
    p.add_argument("--model-path", required=True)
    p.add_argument("--config-path", required=True)
    p.add_argument("--fx-img-path", required=True)
    p.add_argument("--mov-img-path", required=True)
    p.add_argument("--fx-img-contrast", default="T1w")
    p.add_argument("--one-cpu-tf", default="True")
    _add_sharding_flags(p)
    args = p.parse_args(argv)
    _maybe_one_cpu(args.one_cpu_tf)

    cfg = InferenceConfig.from_json(args.config_path)
    _apply_sharding_flags(cfg, args)
    params = load_params_any(args.model_path, cfg)
    reg = make_registrar(cfg, params, **sidecar_kwargs(args.model_path, cfg))
    return register(
        cfg, reg, args.fx_img_path, args.mov_img_path,
        fx_contrast=args.fx_img_contrast, naming="bids",
    )


def bids_two_steps(argv=None):
    p = argparse.ArgumentParser(description="BIDS two-step cascade registration.")
    p.add_argument("--model1-path", required=True)
    p.add_argument("--model2-path", required=True)
    p.add_argument("--config-path", required=True)
    p.add_argument("--fx-img-path", required=True)
    p.add_argument("--mov-img-path", required=True)
    p.add_argument("--fx-img-contrast", default="T1w")
    p.add_argument("--one-cpu-tf", default="True")
    _add_sharding_flags(p)
    args = p.parse_args(argv)
    _maybe_one_cpu(args.one_cpu_tf)

    cfg = InferenceConfig.from_json(args.config_path)
    _apply_sharding_flags(cfg, args)
    reg1 = make_registrar(cfg, load_params_any(args.model1_path, cfg),
                          svf_smooth_sigma=cfg.model1_svf_smooth_sigma,
                          **sidecar_kwargs(args.model1_path, cfg))
    reg2 = make_registrar(cfg, load_params_any(args.model2_path, cfg),
                          **sidecar_kwargs(args.model2_path, cfg))
    return register_two_steps(
        cfg, reg1, reg2, args.fx_img_path, args.mov_img_path,
        fx_contrast=args.fx_img_contrast,
    )


def quant_calibrate(argv=None):
    """Calibrate int8 activation scales for a checkpoint and WRITE the
    ``<model>.quant.json`` sidecar (models/quantize.py).

    TPU-native tool (the reference is f32 TF-CPU and has no quantized path).
    Pairs go through the exact inference preprocessing (`infer/preprocess.py`,
    incl. subvolume tiling when the config asks for it), so the recorded
    amaxes match what the quantized registrar will actually see. With the
    sidecar present, every later quantized process skips the lazy
    full-precision calibration forward (one compile + one forward saved)."""
    from multimodal_registration_tpu.infer.preprocess import preprocess
    from multimodal_registration_tpu.infer.register import vxm_config_from
    from multimodal_registration_tpu.models.quantize import (
        calibrate_scales,
        save_scales,
        sidecar_path,
    )

    p = argparse.ArgumentParser(
        description="Write the int8 activation-scale sidecar for a checkpoint."
    )
    p.add_argument("--model-path", required=True)
    p.add_argument("--config-path", required=True)
    p.add_argument("--pair", action="append", required=True,
                   metavar="FIXED.nii.gz,MOVING.nii.gz",
                   help="calibration pair (repeatable; 1-3 representative "
                        "pairs are plenty — scales are per-tensor running "
                        "amaxes)")
    p.add_argument("--out", default=None,
                   help="sidecar path (default: <model-path>.quant.json)")
    p.add_argument("--margin", type=float, default=1.25,
                   help="headroom factor on the recorded amaxes")
    p.add_argument("--one-cpu-tf", default="True")
    args = p.parse_args(argv)
    _maybe_one_cpu(args.one_cpu_tf)

    cfg = InferenceConfig.from_json(args.config_path)
    if not (cfg.quantize or ""):
        cfg.quantize = "int8"  # calibration implies the int8 layout
    params = load_params_any(args.model_path, cfg)

    pairs = []
    for spec in args.pair:
        parts = spec.split(",")
        if len(parts) != 2:
            raise SystemExit(
                f"--pair wants FIXED,MOVING (two comma-separated paths), got: {spec!r}"
            )
        pre = preprocess(cfg, nifti.load(parts[0]), nifti.load(parts[1]))
        if cfg.use_subvol:
            pairs.extend(
                (np.asarray(m, np.float32)[None, ..., None],
                 np.asarray(f, np.float32)[None, ..., None])
                for m, f in zip(pre.subvols_mov, pre.subvols_fx)
            )
        else:
            pairs.append(
                (pre.moving.get_fdata()[None, ..., None],
                 pre.fixed.get_fdata()[None, ..., None])
            )

    quant = calibrate_scales(vxm_config_from(cfg), params, pairs,
                             margin=args.margin)
    import jax

    if not jax.tree_util.tree_leaves(quant):
        raise SystemExit(
            "no quantizable conv at these widths (every conv input is thinner "
            "than the int8 threshold) — nothing to calibrate; int8 only pays "
            "at the published enc-256 widths (PERF.md round 4f)"
        )
    out = args.out or sidecar_path(args.model_path)
    save_scales(out, quant)
    print(out)
    return out


def gen_apply_def_field(argv=None):
    """Generate a Perlin deformation field and apply it to a volume
    (`gen_apply_def_field.py` parity)."""
    import jax

    from multimodal_registration_tpu.ops.warp import warp as device_warp
    from multimodal_registration_tpu.synth.perlin import draw_perlin

    p = argparse.ArgumentParser(description="Deform an image with a generated deformation field.")
    p.add_argument("--im-path", required=True)
    p.add_argument("--res-dir", default="res")
    p.add_argument("--out-im-name", default="moved_im")
    p.add_argument("--out-def-name", default="deformation_field")
    p.add_argument("--def-scales", type=int, nargs="+", default=[16, 32, 64])
    p.add_argument("--def-max-std", type=float, default=3)
    p.add_argument("--interp", default="linear")
    p.add_argument("--seed", type=int, default=None,
                   help="PRNG seed; default random per invocation (reference parity)")
    args = p.parse_args(argv)
    if args.seed is None:
        args.seed = int.from_bytes(os.urandom(4), "little")

    img = nifti.load(args.im_path)
    os.makedirs(args.res_dir, exist_ok=True)
    shape = img.shape[:3]
    field = np.asarray(
        draw_perlin(
            jax.random.PRNGKey(args.seed), (*shape, 1, 3),
            scales=args.def_scales, max_std=args.def_max_std,
        )
    )
    out_def_path = os.path.join(args.res_dir, f"{args.out_def_name}.nii.gz")
    nifti.save(nifti.NiftiImage(field[..., 0, :], img.affine), out_def_path)

    import jax.numpy as jnp

    moved = np.asarray(
        device_warp(
            jnp.asarray(img.get_fdata(), jnp.float32),
            jnp.asarray(field[..., 0, :], jnp.float32),
            interp=args.interp,
        )
    )
    out_im_path = os.path.join(args.res_dir, f"{args.out_im_name}.nii.gz")
    vio.save_volfile(moved, out_im_path, img.affine)
    return {"def_field": out_def_path, "moved": out_im_path}
