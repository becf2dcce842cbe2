"""Single-model registration flow: preprocess → jitted model → field assembly
→ NIfTI postprocess.

Parity target: ``register``/``run_main`` of `bids_registration.py:274-441` and
`3d_reg.py:262-425`. Output-file naming contract is preserved exactly
(``*_proc``, ``*_proc_reg_to_<CONTRAST>``, ``*_proc_field_to_<CONTRAST>`` with
NIfTI intent 1007, ``*_reg_original_dim``, ``*_warp_original_dim``).

Bug fixed from the reference: `3d_reg.py:421` references an undefined
``fx_contrast`` (NameError) — here the standalone path takes an explicit
contrast label with a default.

TPU notes: the model runs jitted per (bucketed floor16) shape; the subvolume
path batches ALL tiles into one device call (the reference predicts tile by
tile, `bids_registration.py:344-348`) and blends on device.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_registration_tpu.infer.blend import blend_subvol_fields
from multimodal_registration_tpu.infer.config import InferenceConfig
from multimodal_registration_tpu.infer.preprocess import preprocess
from multimodal_registration_tpu.models.vxm_dense import VxmConfig, VxmDense
from multimodal_registration_tpu.ops.resample import affine_resample
from multimodal_registration_tpu.ops.resize import rescale_field
from multimodal_registration_tpu.ops.warp import warp as device_warp
from multimodal_registration_tpu.utils import nifti


def vxm_config_from(cfg: InferenceConfig,
                    svf_smooth_sigma: float | None = None) -> VxmConfig:
    """The model config an :class:`InferenceConfig` maps to (shared by the
    single-device and sharded registrars and the calibration CLI, so every
    construction site agrees on the quantize/smoothing semantics)."""
    return VxmConfig(
        enc=tuple(cfg.enc),
        dec=tuple(cfg.dec),
        int_steps=cfg.int_steps,
        int_res=cfg.int_res,
        svf_res=cfg.svf_res,
        compute_dtype=cfg.compute_dtype,
        svf_smooth_sigma=float(
            (cfg.svf_smooth_sigma if svf_smooth_sigma is None
             else svf_smooth_sigma) or 0.0  # None (JSON null) = off
        ),
        quantize=str(getattr(cfg, "quantize", "") or ""),
    )


def persist_quant_sidecar(path: str, quant) -> bool:
    """Best-effort write of lazily-calibrated int8 scales to the checkpoint's
    ``<model>.quant.json`` sidecar, so the one-time calibration forward is
    paid once per checkpoint instead of once per process. Never raises —
    a read-only checkpoint directory only costs recalibration next run."""
    import warnings

    if not path or not jax.tree_util.tree_leaves(quant):
        return False
    try:
        from multimodal_registration_tpu.models.quantize import save_scales

        save_scales(path, quant)
        return True
    except OSError as e:  # pragma: no cover - depends on fs permissions
        warnings.warn(f"could not persist int8 scales to {path}: {e}")
        return False


class Registrar:
    """Holds params + per-shape jitted apply functions.

    Batches larger than ``max_batch`` (e.g. all subvolume tiles of a subject,
    `bids_registration.py:344-348`) are processed in fixed-size chunks: one
    compiled executable regardless of tile count, bounded activation memory.
    """

    def __init__(self, cfg: InferenceConfig, params, max_batch: int = 4,
                 svf_smooth_sigma: float | None = None, quant_scales=None,
                 quant_sidecar: str | None = None):
        self.cfg = cfg
        self.vxm_cfg = vxm_config_from(cfg, svf_smooth_sigma)
        self.model = VxmDense(cfg=self.vxm_cfg)
        self.params = params
        self.max_batch = max_batch
        # int8 activation scales: passed in (models/quantize.py sidecar) or
        # lazily calibrated on the first predicted chunk (one extra
        # full-precision forward; every returned output is quantized-path).
        # When ``quant_sidecar`` names a path, lazily-calibrated scales are
        # persisted there so later processes skip the calibration forward.
        self.quant_scales = quant_scales
        self.quant_sidecar = quant_sidecar
        self._apply = jax.jit(
            lambda p, m, f: self.model.apply(p, m, f)
        )

    def _variables(self, m, f):
        if not self.vxm_cfg.quantize:
            return self.params
        if self.quant_scales is None:
            from multimodal_registration_tpu.models.quantize import calibrate_scales

            self.quant_scales = calibrate_scales(
                self.vxm_cfg, self.params, [(m, f)]
            )
            persist_quant_sidecar(self.quant_sidecar, self.quant_scales)
        return {**self.params, "quant": self.quant_scales}

    def predict(self, mov: np.ndarray, fx: np.ndarray):
        """Batched predict on (B, X, Y, Z) arrays → (moved, warp_at_int_res)."""
        B = mov.shape[0]
        chunk = min(self.max_batch, B)
        moved_parts, warp_parts = [], []
        for s in range(0, B, chunk):
            m = np.asarray(mov[s : s + chunk], np.float32)
            f = np.asarray(fx[s : s + chunk], np.float32)
            n = m.shape[0]
            if n < chunk:  # pad so every chunk hits the same executable
                pad = chunk - n
                m = np.concatenate([m, np.zeros((pad, *m.shape[1:]), np.float32)])
                f = np.concatenate([f, np.zeros((pad, *f.shape[1:]), np.float32)])
            mj, fj = jnp.asarray(m)[..., None], jnp.asarray(f)[..., None]
            out = self._apply(self._variables(mj, fj), mj, fj)
            moved_parts.append(np.asarray(out["moved"][..., 0])[:n])
            warp_parts.append(np.asarray(out["warp"])[:n])
        return np.concatenate(moved_parts), np.concatenate(warp_parts)


@partial(jax.jit, static_argnames=("interp", "rescale", "out_shape"))
def _apply_warp_jit(v, f, interp, rescale, out_shape):
    if rescale != 1:
        f = rescale_field(f, rescale, out_shape=out_shape)
    return device_warp(v, f, interp=interp)


def apply_warp(vol: np.ndarray, field: np.ndarray, interp: str, rescale: int = 1) -> np.ndarray:
    """``vxm.networks.Transform(rescale=...)`` parity: upsample the field by
    ``rescale`` (scaling vectors), then warp."""
    return np.asarray(
        _apply_warp_jit(
            jnp.asarray(vol, jnp.float32),
            jnp.asarray(field, jnp.float32),
            interp,
            int(rescale),
            tuple(vol.shape[:3]),
        )
    )


@partial(jax.jit, static_argnames=("scale", "perm", "inv", "out_shape"))
def _export_warp_jit(warp_data, scale, perm, inv, out_shape):
    """Full-res field + RAI component permutation/sign-flip fused on device —
    one transfer instead of a host upsample copy + two full-res numpy copies."""
    w = warp_data
    if scale != 1:
        w = rescale_field(w, scale, out_shape=out_shape)
    return jnp.stack([inv[i] * w[..., perm[i]] for i in range(3)], axis=-1)


def _upsample2x_host(v: np.ndarray) -> np.ndarray:
    """Numpy twin of the device corner-aligned 2x upsample
    (``ops/resize._upsample2x_axis``): out[2i]=v[i], out[2i+1]=mean(v[i],v[i+1])
    edge-clamped, applied to all three spatial axes of an (X,Y,Z,C) field."""
    for ax in (2, 1, 0):
        nxt = np.concatenate(
            [np.take(v, range(1, v.shape[ax]), axis=ax),
             np.take(v, [v.shape[ax] - 1], axis=ax)], axis=ax,
        )
        mid = (0.5 * (v + nxt)).astype(v.dtype)
        v = np.stack([v, mid], axis=ax + 1).reshape(
            *v.shape[:ax], 2 * v.shape[ax], *v.shape[ax + 1:]
        )
    return v


def _export_warp_host(warp_data, scale, perm, inv):
    """Host twin of :func:`_export_warp_jit` for the 1x/2x cases.

    On the tunnel-attached TPU the jitted export costs a ~60 MB device→host
    transfer (~3 s at the measured ~22 MB/s link) for ~0.3 s of memory-bound
    interleaving — host wins whenever the field is already in host memory
    (PERF.md round 4). ``MMREG_EXPORT_DEVICE=1`` restores the device path."""
    w = np.asarray(warp_data, np.float32)
    if scale == 2:
        w = _upsample2x_host(w) * np.float32(scale)
    return np.stack([np.float32(inv[i]) * w[..., perm[i]] for i in range(3)], axis=-1)


def _out_dtype():
    """Exported-volume dtype: f32 by default (halves the gzip payload of the
    largest outputs); MMREG_F64_OUTPUTS=1 restores the reference's float64
    writes (nilearn resample_img / numpy defaults) byte-for-byte."""
    return np.float64 if os.environ.get("MMREG_F64_OUTPUTS") else np.float32


def postprocess_and_save(
    warp_data: np.ndarray,
    scale: int,
    fixed_proc: nifti.NiftiImage,
    fixed_nii: nifti.NiftiImage,
    moving_nii: nifti.NiftiImage,
    moved: np.ndarray,
    paths: dict,
    timings: dict | None = None,
):
    """Shared output stage (`bids_registration.py:387-429`).

    TPU-native restructure (round 4): the field upsample + RAI permutation run
    in one jitted call (single device→host transfer), and the moved volume +
    all three field components resample onto the original moving grid in ONE
    channel-batched device spline call (the reference resamples them one at a
    time host-side, `bids_registration.py:387-429`)."""
    import time as _time

    _t = [_time.time()]

    def _mk(key):
        if timings is not None:
            now = _time.time()
            timings[key] = round(now - _t[0], 3)
            _t[0] = now

    # moved on the fixed/processed grid
    if "moved_proc" in paths:
        nifti.save(
            nifti.NiftiImage(np.asarray(moved, np.float32), fixed_proc.affine),
            paths["moved_proc"],
        )
    _mk("postprocess.save_moved_proc")

    # RAI permutation / sign flips for sct_apply_transfo (`:401-421`)
    orientation_conv = "RAI"
    fx_orient = list(nifti.aff2axcodes(-np.asarray(fixed_nii.affine)))
    opposite = {"L": "R", "R": "L", "A": "P", "P": "A", "I": "S", "S": "I"}
    perm, inversion = [0, 1, 2], [1, 1, 1]
    for i, ch in enumerate(orientation_conv):
        if ch in fx_orient:
            perm[i] = fx_orient.index(ch)
        else:
            perm[i] = fx_orient.index(opposite[ch])
            inversion[i] = -1

    full_shape = tuple(int(s) * scale for s in warp_data.shape[:3])
    if scale in (1, 2) and not os.environ.get("MMREG_EXPORT_DEVICE"):
        warp_rai = _export_warp_host(warp_data, int(scale), perm, inversion)
    else:
        warp_rai = np.asarray(
            _export_warp_jit(
                jnp.asarray(warp_data, jnp.float32), int(scale),
                tuple(perm), tuple(float(v) for v in inversion), full_shape,
            )
        )  # (X, Y, Z, 3) float32 on the proc grid, already RAI-exported
    warp_exp = warp_rai[:, :, :, None, :]  # add time axis
    _mk("postprocess.field_export")

    # moved + field components back onto the original moving grid, one call
    need_orig = ("moved_orig" in paths) or ("warp_orig" in paths)
    moved_orig = None
    warp_orig = None
    if need_orig:
        M = np.linalg.inv(fixed_proc.affine) @ moving_nii.affine
        identity = tuple(moving_nii.shape[:3]) == tuple(np.shape(moved)[:3]) and np.allclose(
            M, np.eye(4), rtol=0, atol=1e-9
        )
        if identity:
            moved_orig = np.asarray(moved, np.float64)
            warp_orig = warp_exp
        else:
            stacked = np.concatenate(
                [np.asarray(moved, np.float32)[..., None], warp_rai], axis=-1
            )
            res = affine_resample(
                stacked, fixed_proc.affine, moving_nii.affine,
                moving_nii.shape[:3], "spline",
            )
            moved_orig = res[..., 0]
            warp_orig = np.ascontiguousarray(res[..., 1:], dtype=np.float32)[:, :, :, None, :]
    _mk("postprocess.resample_orig")

    if "moved_orig" in paths:
        nifti.save(
            nifti.NiftiImage(moved_orig.astype(_out_dtype()), moving_nii.affine),
            paths["moved_orig"],
        )
    _mk("postprocess.save_moved_orig")

    warp_img = nifti.NiftiImage(warp_exp, fixed_proc.affine)
    warp_img.header["intent_code"] = 1007
    if "warp_proc" in paths:
        nifti.save(warp_img, paths["warp_proc"])
    _mk("postprocess.save_warp_proc")

    if "warp_orig" in paths:
        # f32 like the reference's field outputs (K.eval / nib write f32);
        # f64 would double the gzip payload of the largest output file
        warp_orig_img = nifti.NiftiImage(np.asarray(warp_orig, np.float32), moving_nii.affine)
        warp_orig_img.header["intent_code"] = 1007
        nifti.save(warp_orig_img, paths["warp_orig"])
    _mk("postprocess.save_warp_orig")

    return moved_orig, warp_exp


def _infer_fields_single(cfg, registrar, pre):
    """Run the model; return (moved_proc_or_None, warp_data, scale)."""
    warp_interp = cfg.warp_interpolation if cfg.warp_interpolation in ("linear", "nearest") else "linear"
    mov_data = pre.moving.get_fdata()
    fx_data = pre.fixed.get_fdata()

    if not cfg.use_subvol:
        moved_b, warp_b = registrar.predict(mov_data[None], fx_data[None])
        warp_data = warp_b[0]
        scale = 1 if warp_data.shape[0] == pre.model_in_shape[0] else 2
        if warp_interp == "linear":
            moved = moved_b[0]
        else:
            moved = apply_warp(mov_data, warp_data, "nearest", rescale=scale)
        return moved, warp_data, scale

    # subvolume path: batch all tiles in one call
    fx_tiles = np.stack(pre.subvols_fx)
    mov_tiles = np.stack(pre.subvols_mov)
    _, warps = registrar.predict(mov_tiles, fx_tiles)

    model_in_shape = list(pre.model_in_shape)
    coords = list(pre.subvol_coords)
    moving_shape = list(mov_data.shape)
    if warps.shape[1] != pre.model_in_shape[0]:
        scale = 2
        model_in_shape = [s // 2 for s in model_in_shape]
        moving_shape = [s // 2 for s in moving_shape]
        coords = [tuple(c // 2 for c in co) for co in coords]
    else:
        scale = 1

    warp_data = np.asarray(
        blend_subvol_fields(tuple(model_in_shape), tuple(moving_shape), coords, list(warps))
    )
    moved = apply_warp(mov_data, warp_data, warp_interp, rescale=scale)
    return moved, warp_data, scale


def register(
    cfg: InferenceConfig,
    registrar: Registrar,
    fx_im_path: str,
    mov_im_path: str,
    fx_contrast: str = "T1w",
    naming: str = "bids",
    res_dir: str = "res",
    out_im_name: str = "warped_im",
    out_field_name: str = "deform_field",
    fixed_nii: "nifti.NiftiImage | None" = None,
    moving_nii: "nifti.NiftiImage | None" = None,
):
    """Register moving → fixed and write the reference's output files.

    ``naming='bids'`` mirrors `bids_registration.py`; ``naming='standalone'``
    mirrors `3d_reg.py` (moved/warp in original space into ``res_dir``).
    ``fixed_nii``/``moving_nii`` may be passed preloaded (e.g. from the native
    prefetch pool) to skip the decode here.
    """
    import time

    timings = {}
    t = [time.time()]

    def _mark(phase):
        now = time.time()
        timings[phase] = round(now - t[0], 3)
        t[0] = now

    if fixed_nii is None:
        fixed_nii = nifti.load(fx_im_path)
    if moving_nii is None:
        moving_nii = nifti.load(mov_im_path)
    fx_stem = fx_im_path.split(".")[0]
    mov_stem = mov_im_path.split(".")[0]
    _mark("load")

    pre = preprocess(cfg, fixed_nii, moving_nii)
    _mark("preprocess")
    nifti.save(pre.fixed, f"{fx_stem}_proc.nii.gz")
    nifti.save(pre.moving, f"{mov_stem}_proc.nii.gz")
    _mark("save_proc")

    moved, warp_data, scale = _infer_fields_single(cfg, registrar, pre)
    _mark("predict")

    if naming == "bids":
        paths = {
            "moved_proc": f"{mov_stem}_proc_reg_to_{fx_contrast}.nii.gz",
            "moved_orig": f"{mov_stem}_reg_original_dim.nii.gz",
            "warp_proc": f"{mov_stem}_proc_field_to_{fx_contrast}.nii.gz",
            "warp_orig": f"{mov_stem}_warp_original_dim.nii.gz",
        }
    else:
        os.makedirs(res_dir, exist_ok=True)
        paths = {
            "moved_proc": f"{mov_stem}_proc_reg_to_{fx_contrast}.nii.gz",
            "moved_orig": os.path.join(res_dir, f"{out_im_name}.nii.gz"),
            "warp_proc": f"{mov_stem}_proc_field_to_{fx_contrast}.nii.gz",
            "warp_orig": os.path.join(res_dir, f"{out_field_name}.nii.gz"),
        }

    moved_orig, warp_exp = postprocess_and_save(
        warp_data, scale, pre.fixed, fixed_nii, moving_nii, moved, paths,
        timings=timings,
    )
    _mark("postprocess")
    return {
        "moved": moved,
        "moved_orig": moved_orig,
        "warp": warp_exp,
        "warp_data": warp_data,  # working-space field at int-res (pre-RAI-export)
        "paths": paths,
        "scale": scale,
        "timings": timings,
    }


def load_params_any(path: str, cfg: InferenceConfig):
    """Load model weights from Keras .h5 / flat .npz / orbax dir."""
    from multimodal_registration_tpu.models.vxm_dense import params_template

    template = params_template(
        VxmConfig(
            enc=tuple(cfg.enc), dec=tuple(cfg.dec), int_steps=cfg.int_steps,
            int_res=cfg.int_res, svf_res=cfg.svf_res, compute_dtype=cfg.compute_dtype,
        ),
        inshape=(16, 16, 16),
    )
    def _arch_hint(e):
        return ValueError(
            f"checkpoint {path!r} does not match the config's architecture "
            f"(enc={list(cfg.enc)}, dec={list(cfg.dec)}) — point --config-path "
            f"at the config this model was trained/exported with. Underlying "
            f"error: {e}"
        )

    if path.endswith((".h5", ".hdf5")):
        from multimodal_registration_tpu.models.h5_import import import_keras_vxm_h5

        vxm_cfg = VxmConfig(enc=tuple(cfg.enc), dec=tuple(cfg.dec))
        try:
            return import_keras_vxm_h5(path, template, vxm_cfg)
        except (KeyError, ValueError) as e:
            raise _arch_hint(e) from e
    if path.endswith(".npz"):
        from multimodal_registration_tpu.train.trainer import _unflatten_params

        try:
            return _unflatten_params(template, dict(np.load(path)))
        except (KeyError, ValueError) as e:
            raise _arch_hint(e) from e
    import orbax.checkpoint as ocp

    restored = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
    return restored["params"]
