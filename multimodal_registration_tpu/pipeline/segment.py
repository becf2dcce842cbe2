"""Pluggable spinal-cord segmentation + the center-of-mass affine fallback.

Parity targets:
  * SCT ``sct_deepseg_sc -i vol -c <contrast>``
    (`pipeline_bids_register_evaluate.sh:34-41`) — wrapped when the SCT CLI is
    on PATH; otherwise a built-in intensity segmenter keeps the pipeline
    runnable end-to-end,
  * SCT ``sct_register_multimodal … step=1,type=seg,algo=centermass``
    (`pipeline_bids_register_evaluate_opt_affine.sh:174`) — a slice-wise
    center-of-mass translation computed on the segmentations, realized as a
    dense warp field on device.
"""

from __future__ import annotations

import shutil
import subprocess

import numpy as np

from multimodal_registration_tpu.utils import nifti

# contrast → sct_deepseg_sc -c value (pipeline_bids_register_evaluate.sh:36-39)
_SCT_CONTRAST = {"T1w": "t1", "T2w": "t2", "T2star": "t2s", "dwi": "dwi"}


class Segmenter:
    """Interface: __call__(image_path, contrast, out_path) -> out_path."""

    def __call__(self, image_path: str, contrast: str, out_path: str) -> str:
        raise NotImplementedError


class SCTSegmenter(Segmenter):
    """Shells out to ``sct_deepseg_sc`` (requires the SCT toolbox)."""

    @staticmethod
    def available() -> bool:
        return shutil.which("sct_deepseg_sc") is not None

    def __call__(self, image_path: str, contrast: str, out_path: str) -> str:
        c = _SCT_CONTRAST.get(contrast, contrast.lower())
        subprocess.run(
            ["sct_deepseg_sc", "-i", image_path, "-c", c, "-o", out_path],
            check=True,
        )
        return out_path


class ThresholdSegmenter(Segmenter):
    """Fallback segmenter: bright-structure threshold + largest connected
    component. Keeps the full pipeline runnable without SCT; replace with
    SCTSegmenter (or any callable) in production."""

    def __init__(self, percentile: float = 97.0):
        self.percentile = percentile

    def __call__(self, image_path: str, contrast: str, out_path: str) -> str:
        from scipy import ndimage

        img = nifti.load(image_path, cached=True)
        data = img.get_fdata()
        thr = np.percentile(data, self.percentile)
        mask = data >= thr
        lab, n = ndimage.label(mask)
        if n > 1:
            sizes = ndimage.sum(mask, lab, range(1, n + 1))
            mask = lab == (1 + int(np.argmax(sizes)))
        out = nifti.NiftiImage(mask.astype(np.uint8), img.affine)
        nifti.save(out, out_path)
        return out_path


def default_segmenter() -> Segmenter:
    return SCTSegmenter() if SCTSegmenter.available() else ThresholdSegmenter()


def centermass_affine_field(fx_seg: np.ndarray, mov_seg: np.ndarray) -> np.ndarray:
    """Slice-wise center-of-mass alignment field ``(X, Y, Z, 3)`` that maps the
    moving segmentation onto the fixed one (z slices are the cord axis).

    Equivalent role to SCT's ``algo=centermass``
    (`pipeline_bids_register_evaluate_opt_affine.sh:174`): per z-slice, the
    in-plane translation between the segmentation centroids; slices without
    cord pixels inherit the nearest valid slice's translation.
    """
    X, Y, Z = fx_seg.shape
    tx = np.zeros(Z)
    ty = np.zeros(Z)
    valid = np.zeros(Z, bool)
    xs = np.arange(X)[:, None]
    ys = np.arange(Y)[None, :]
    for z in range(Z):
        f, m = fx_seg[:, :, z], mov_seg[:, :, z]
        if f.sum() > 0 and m.sum() > 0:
            fx_com = (np.sum(xs * f) / f.sum(), np.sum(ys * f) / f.sum())
            mv_com = (np.sum(xs * m) / m.sum(), np.sum(ys * m) / m.sum())
            # displacement field convention: moved(x) = mov(x + phi(x)), so to
            # place the moving centroid at the fixed centroid: phi = com_m - com_f
            tx[z] = mv_com[0] - fx_com[0]
            ty[z] = mv_com[1] - fx_com[1]
            valid[z] = True
    if valid.any():
        idx = np.where(valid)[0]
        # nearest-valid fill (then the ends are constant-extended)
        all_z = np.arange(Z)
        nearest = idx[np.argmin(np.abs(all_z[:, None] - idx[None, :]), axis=1)]
        tx = tx[nearest]
        ty = ty[nearest]
    field = np.zeros((X, Y, Z, 3), np.float32)
    field[..., 0] = tx[None, None, :]
    field[..., 1] = ty[None, None, :]
    return field


def apply_affine_field(image_path: str, field: np.ndarray, out_path: str, interp="linear"):
    """Warp a volume by the (full-resolution) field and save it."""
    import jax.numpy as jnp

    from multimodal_registration_tpu.ops.warp import warp as device_warp

    img = nifti.load(image_path, cached=True)
    moved = np.asarray(
        device_warp(jnp.asarray(img.get_fdata(), jnp.float32), jnp.asarray(field), interp)
    )
    nifti.save(nifti.NiftiImage(moved, img.affine), out_path)
    return out_path
