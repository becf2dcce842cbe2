"""Two-step (cascade) registration: smooth/"affine-like" model followed by a
fine deformable model, with dense-field composition.

Parity target: ``register`` of `bids_two_steps_registration.py:274-546`:

  * whole-volume linear: ``model1(mov, fx) → moved1``; ``model2(moved1, fx)``;
    final field = ``compose(warp1, warp2)`` at native (int-res) resolution
    (`:317-325`),
  * whole-volume nearest: moved1 produced by nearest-warping the processed
    moving volume with the rescaled warp1, then as above (`:326-358`),
  * subvolume linear: per-tile model1 → model2 → per-tile compose, then
    pyramid blending (`:362-404`),
  * subvolume nearest: blend warp1 → warp the full volume → RE-preprocess the
    moved result (second tiling pass) → per-tile model2 → blend warp2 →
    compose the two full-volume fields (`:406-502`),
  * shared postprocess identical to the single-model path (`:504-546`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_registration_tpu.infer.blend import blend_subvol_fields
from multimodal_registration_tpu.infer.config import InferenceConfig
from multimodal_registration_tpu.infer.preprocess import preprocess
from multimodal_registration_tpu.infer.register import (
    Registrar,
    apply_warp,
    postprocess_and_save,
)
from multimodal_registration_tpu.ops.field import compose_fields, compose_fields_batch
from multimodal_registration_tpu.ops.resize import rescale_field
from multimodal_registration_tpu.utils import nifti


@partial(jax.jit, static_argnames=("scale", "out_shape"))
def _compose_full_jit(w1, w2, scale, out_shape):
    """Upsample both step fields to the image grid and compose there.

    Folding rationale (VERDICT r3 #3, PERF.md round 4): ``compose`` samples
    phi1 by linear interpolation at displaced points; at the int-res grid the
    interpolation error of the smooth step-1 field (mean |flow| ~3 voxels)
    is what folds the EXPORTED full-res field once it is upsampled. Composing
    on the grid the evaluator differentiates removes that resampling step."""
    w1f = rescale_field(w1, scale, out_shape=out_shape)
    w2f = rescale_field(w2, scale, out_shape=out_shape)
    return compose_fields(w1f, w2f)


def _compose_final(cfg, warp1, warp2, scale, full_shape):
    """Final-field composition honoring ``cfg.cascade_compose_res``.

    Returns (warp_data, scale): 'full' composes on the image grid (returned
    scale 1); 'int' keeps the reference semantics — compose at int-res,
    upsampled later by the shared postprocess
    (`bids_two_steps_registration.py:324` + `:515`)."""
    if cfg.cascade_compose_res == "full" and scale != 1:
        warp_data = np.asarray(
            _compose_full_jit(
                jnp.asarray(warp1), jnp.asarray(warp2), int(scale), tuple(full_shape)
            )
        )
        return warp_data, 1
    return np.asarray(compose_fields(jnp.asarray(warp1), jnp.asarray(warp2))), scale


def _blend(cfg, pre, warps, coords, mov_shape, model_in_shape):
    """Blend per-tile fields, handling half-resolution coordinates."""
    model_in = list(model_in_shape)
    mshape = list(mov_shape)
    cds = list(coords)
    if warps.shape[1] != model_in_shape[0]:
        scale = 2
        model_in = [s // 2 for s in model_in]
        mshape = [s // 2 for s in mshape]
        cds = [tuple(c // 2 for c in co) for co in cds]
    else:
        scale = 1
    field = np.asarray(
        blend_subvol_fields(tuple(model_in), tuple(mshape), cds, list(warps))
    )
    return field, scale


def register_two_steps(
    cfg: InferenceConfig,
    reg1: Registrar,
    reg2: Registrar,
    fx_im_path: str,
    mov_im_path: str,
    fx_contrast: str = "T1w",
):
    warp_interp = (
        cfg.warp_interpolation if cfg.warp_interpolation in ("linear", "nearest") else "linear"
    )
    fixed_nii = nifti.load(fx_im_path)
    moving_nii = nifti.load(mov_im_path)
    fx_stem = fx_im_path.split(".")[0]
    mov_stem = mov_im_path.split(".")[0]

    pre = preprocess(cfg, fixed_nii, moving_nii)
    nifti.save(pre.fixed, f"{fx_stem}_proc.nii.gz")
    nifti.save(pre.moving, f"{mov_stem}_proc.nii.gz")
    mov_data = pre.moving.get_fdata()
    fx_data = pre.fixed.get_fdata()

    if not cfg.use_subvol:
        moved1_b, warp1_b = reg1.predict(mov_data[None], fx_data[None])
        warp1 = warp1_b[0]
        scale = 1 if warp1.shape[0] == pre.model_in_shape[0] else 2
        if warp_interp == "linear":
            moved1 = moved1_b[0]
        else:
            moved1 = apply_warp(mov_data, warp1, "nearest", rescale=scale)
        moved2_b, warp2_b = reg2.predict(moved1[None], fx_data[None])
        warp2 = warp2_b[0]
        warp_data, scale = _compose_final(cfg, warp1, warp2, scale, mov_data.shape[:3])
        if warp_interp == "linear":
            moved = moved2_b[0]
        else:
            moved = apply_warp(mov_data, warp_data, "nearest", rescale=scale)
    elif warp_interp == "linear":
        fx_tiles = np.stack(pre.subvols_fx)
        mov_tiles = np.stack(pre.subvols_mov)
        moved1_t, warp1_t = reg1.predict(mov_tiles, fx_tiles)
        _, warp2_t = reg2.predict(moved1_t, fx_tiles)
        if cfg.cascade_compose_res == "full":
            # blend each step's tiles to a full-volume field, then compose on
            # the image grid (same folding rationale as the whole-vol path)
            warp1_full, scale = _blend(
                cfg, pre, warp1_t, pre.subvol_coords, mov_data.shape, pre.model_in_shape
            )
            warp2_full, _ = _blend(
                cfg, pre, warp2_t, pre.subvol_coords, mov_data.shape, pre.model_in_shape
            )
            warp_data, scale = _compose_final(
                cfg, warp1_full, warp2_full, scale, mov_data.shape[:3]
            )
        else:
            # reference semantics: per-tile compose, then blend. One batched
            # compose over the stacked tiles: a single executable, halo cond
            # hoisted above the batch (vs N eager per-tile dispatches on a
            # 30s-5min-per-HLO backend)
            composed = np.asarray(
                compose_fields_batch(jnp.asarray(warp1_t), jnp.asarray(warp2_t))
            )
            warp_data, scale = _blend(
                cfg, pre, composed, pre.subvol_coords, mov_data.shape, pre.model_in_shape
            )
        moved = apply_warp(mov_data, warp_data, "linear", rescale=scale)
    else:
        # subvol nearest: blend warp1 → warp volume → re-preprocess → model2
        fx_tiles = np.stack(pre.subvols_fx)
        mov_tiles = np.stack(pre.subvols_mov)
        _, warp1_t = reg1.predict(mov_tiles, fx_tiles)
        warp1_full, scale = _blend(
            cfg, pre, warp1_t, pre.subvol_coords, mov_data.shape, pre.model_in_shape
        )
        nifti.save(
            nifti.NiftiImage(warp1_full, pre.fixed.affine),
            f"{mov_stem}_first_proc_field_to_{fx_contrast}.nii.gz",
        )
        moved1 = apply_warp(mov_data, warp1_full, "nearest", rescale=scale)
        nifti.save(
            nifti.NiftiImage(moved1, pre.fixed.affine),
            f"{mov_stem}_proc_first_reg_to_{fx_contrast}.nii.gz",
        )
        # second pass preprocess on the moved result (`:455`)
        pre2 = preprocess(cfg, fixed_nii, nifti.NiftiImage(moved1, pre.fixed.affine))
        fx_tiles2 = np.stack(pre2.subvols_fx)
        mov_tiles2 = np.stack(pre2.subvols_mov)
        _, warp2_t = reg2.predict(mov_tiles2, fx_tiles2)
        warp2_full, scale2 = _blend(
            cfg, pre2, warp2_t, pre2.subvol_coords,
            pre2.moving.get_fdata().shape, pre2.model_in_shape,
        )
        if scale2 != scale:
            # both models must produce fields on the same grid for the
            # compose below — differing int_res configs would silently
            # sample the coarser field with the finer grid's coordinates
            raise ValueError(
                f"cascade models disagree on field scale ({scale} vs "
                f"{scale2}); use models with identical int_res"
            )
        warp_data, scale = _compose_final(
            cfg, warp1_full, warp2_full, scale, mov_data.shape[:3]
        )
        moved = apply_warp(mov_data, warp_data, "nearest", rescale=scale)

    paths = {
        "moved_proc": f"{mov_stem}_proc_reg_to_{fx_contrast}.nii.gz",
        "moved_orig": f"{mov_stem}_reg_original_dim.nii.gz",
        "warp_proc": f"{mov_stem}_proc_field_to_{fx_contrast}.nii.gz",
        "warp_orig": f"{mov_stem}_warp_original_dim.nii.gz",
    }
    moved_orig, warp_exp = postprocess_and_save(
        warp_data, scale, pre.fixed, fixed_nii, moving_nii, moved, paths
    )
    return {
        "moved": moved,
        "moved_orig": moved_orig,
        "warp": warp_exp,
        "warp_data": warp_data,  # working-space field at int-res (pre-RAI-export)
        "paths": paths,
        "scale": scale,
    }
