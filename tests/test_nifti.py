"""NIfTI native I/O round-trip and header-contract tests."""

import numpy as np
import pytest

from multimodal_registration_tpu.utils import nifti


def test_roundtrip_float32(tmp_path):
    data = np.random.default_rng(0).normal(size=(7, 8, 9)).astype(np.float32)
    affine = np.array(
        [[0.0, 0.0, 2.0, -10.0], [-1.0, 0.0, 0.0, 5.0], [0.0, 1.5, 0.0, 3.0], [0, 0, 0, 1]]
    )
    img = nifti.NiftiImage(data, affine)
    p = tmp_path / "vol.nii.gz"
    nifti.save(img, str(p))
    back = nifti.load(str(p))
    np.testing.assert_allclose(back.get_fdata(), data, atol=1e-6)
    np.testing.assert_allclose(back.affine, affine, atol=1e-4)


def test_roundtrip_uint8_plain_nii(tmp_path):
    data = np.random.default_rng(1).integers(0, 26, size=(5, 6, 7)).astype(np.uint8)
    img = nifti.NiftiImage(data, np.eye(4))
    p = tmp_path / "lab.nii"
    nifti.save(img, str(p))
    back = nifti.load(str(p))
    assert back.dataobj.dtype == np.uint8
    np.testing.assert_array_equal(back.dataobj, data)


def test_intent_code_roundtrip(tmp_path):
    """The sct_apply_transfo contract: intent_code 1007 on warp fields
    (`bids_registration.py:423`)."""
    warp = np.zeros((4, 4, 4, 1, 3), np.float32)
    img = nifti.NiftiImage(warp, np.eye(4))
    img.header["intent_code"] = 1007
    p = tmp_path / "warp.nii.gz"
    nifti.save(img, str(p))
    back = nifti.load(str(p))
    assert back.header["intent_code"] == 1007
    assert back.shape == (4, 4, 4, 1, 3)


def test_scl_slope_inter(tmp_path):
    data = np.arange(8, dtype=np.int16).reshape(2, 2, 2)
    img = nifti.NiftiImage(data, np.eye(4))
    img.header.scl_slope = 2.0
    img.header.scl_inter = 1.0
    p = tmp_path / "scaled.nii.gz"
    nifti.save(img, str(p))
    back = nifti.load(str(p))
    np.testing.assert_allclose(back.get_fdata(), data * 2.0 + 1.0)


def test_qform_only_affine(tmp_path):
    data = np.zeros((3, 3, 3), np.float32)
    affine = np.diag([2.0, 3.0, 4.0, 1.0])
    affine[:3, 3] = [1, 2, 3]
    img = nifti.NiftiImage(data, affine)
    img.header.sform_code = 0  # force qform path on load
    p = tmp_path / "qform.nii.gz"
    nifti.save(img, str(p))
    back = nifti.load(str(p))
    np.testing.assert_allclose(back.affine, affine, atol=1e-4)


def test_aff2axcodes():
    assert nifti.aff2axcodes(np.eye(4)) == ("R", "A", "S")
    lps = np.diag([-1.0, -1.0, 1.0, 1.0])
    assert nifti.aff2axcodes(lps) == ("L", "P", "S")
    # permuted: first voxel axis along world z
    perm = np.zeros((4, 4))
    perm[2, 0] = 1.0
    perm[0, 1] = -1.0
    perm[1, 2] = 1.0
    perm[3, 3] = 1.0
    assert nifti.aff2axcodes(perm) == ("S", "L", "A")


def test_nibabel_cross_validation(tmp_path):
    nb = pytest.importorskip("nibabel")
    data = np.random.default_rng(2).normal(size=(6, 5, 4)).astype(np.float32)
    affine = np.array(
        [[1.0, 0, 0, -3.0], [0, 0, -2.0, 7.0], [0, 1.0, 0, 0.5], [0, 0, 0, 1]]
    )
    p = tmp_path / "x.nii.gz"
    nifti.save(nifti.NiftiImage(data, affine), str(p))
    img = nb.load(str(p))
    np.testing.assert_allclose(np.asarray(img.dataobj), data, atol=1e-6)
    np.testing.assert_allclose(img.affine, affine, atol=1e-4)


def test_randomized_roundtrips(tmp_path):
    """Randomized orientation/dtype round-trip sweep."""
    rng = np.random.default_rng(42)
    dtypes = [np.float32, np.float64, np.int16, np.uint8, np.int32, np.uint16]
    for i in range(12):
        ndim = rng.choice([3, 4])
        shape = tuple(rng.integers(2, 7, size=ndim))
        dt = dtypes[i % len(dtypes)]
        if np.issubdtype(dt, np.integer):
            data = rng.integers(0, 100, size=shape).astype(dt)
        else:
            data = rng.normal(size=shape).astype(dt)
        # random axis-permuted, sign-flipped, scaled affine + offset
        perm = rng.permutation(3)
        signs = rng.choice([-1.0, 1.0], size=3)
        zooms = rng.uniform(0.5, 3.0, size=3)
        R = np.zeros((3, 3))
        for a in range(3):
            R[perm[a], a] = signs[a] * zooms[a]
        aff = np.eye(4)
        aff[:3, :3] = R
        aff[:3, 3] = rng.uniform(-50, 50, size=3)
        p = str(tmp_path / f"r{i}.nii.gz")
        nifti.save(nifti.NiftiImage(data, aff), p)
        back = nifti.load(p)
        np.testing.assert_array_equal(np.asarray(back.dataobj), data)
        np.testing.assert_allclose(back.affine, aff, atol=1e-4)
