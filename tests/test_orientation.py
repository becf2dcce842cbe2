"""Warp-field RAI permutation/sign postprocess golden tests.

The reference converts the predicted field into SCT's RAI component
convention via ``aff2axcodes(-fixed_affine)`` lookups
(`bids_registration.py:403-421`). Axis mistakes here are silent, so we pin
hand-derived expectations for known orientations.
"""

import numpy as np

from multimodal_registration_tpu.infer.register import postprocess_and_save
from multimodal_registration_tpu.utils import nifti


def _run(affine, warp_vec, tmp_path):
    shape = (8, 8, 8)
    warp = np.zeros((*shape, 3), np.float32)
    warp[...] = warp_vec
    fixed_proc = nifti.NiftiImage(np.zeros(shape, np.float32), affine)
    fixed_nii = nifti.NiftiImage(np.zeros(shape, np.float32), affine)
    moving_nii = nifti.NiftiImage(np.zeros(shape, np.float32), affine)
    moved = np.zeros(shape, np.float32)
    paths = {"warp_proc": str(tmp_path / "warp.nii.gz")}
    _, warp_exp = postprocess_and_save(
        warp, 1, fixed_proc, fixed_nii, moving_nii, moved, paths
    )
    saved = nifti.load(paths["warp_proc"])
    assert saved.header["intent_code"] == 1007
    return warp_exp[0, 0, 0, 0]  # the constant vector after permutation


def test_ras_fixed_image(tmp_path):
    # RAS affine: aff2axcodes(-I) = (L, P, I) → R,A flipped; I kept
    out = _run(np.eye(4), (1.0, 2.0, 3.0), tmp_path)
    np.testing.assert_allclose(out, [-1.0, -2.0, 3.0])


def test_swapped_xy_fixed_image(tmp_path):
    # vox0→+A, vox1→+R, vox2→+S world axes:
    # aff2axcodes(-aff) = (P, L, I) → saved = (-w1, -w0, +w2)
    aff = np.zeros((4, 4))
    aff[1, 0] = 1.0  # vox axis 0 → world y (A)
    aff[0, 1] = 1.0  # vox axis 1 → world x (R)
    aff[2, 2] = 1.0
    aff[3, 3] = 1.0
    out = _run(aff, (1.0, 2.0, 3.0), tmp_path)
    np.testing.assert_allclose(out, [-2.0, -1.0, 3.0])


def test_lpi_fixed_image(tmp_path):
    # LPI affine (diag -1,-1,-1): aff2axcodes(+I... of -aff) = (R, A, S)
    # 'R' at 0 (+1), 'A' at 1 (+1), 'I' → opposite 'S' at 2 (-1)
    aff = np.diag([-1.0, -1.0, -1.0, 1.0])
    out = _run(aff, (1.0, 2.0, 3.0), tmp_path)
    np.testing.assert_allclose(out, [1.0, 2.0, -3.0])
