"""Affine-grid resampling tests: device path vs scipy, resample_nib parity."""

import numpy as np
import pytest
from scipy.ndimage import affine_transform

from multimodal_registration_tpu.ops.resample import (
    affine_resample,
    pad_or_crop,
    resample_nib,
)
from multimodal_registration_tpu.utils import nifti


def test_identity_resample():
    vol = np.random.default_rng(0).normal(size=(8, 9, 10))
    out = affine_resample(vol, np.eye(4), np.eye(4), (8, 9, 10), "linear")
    np.testing.assert_allclose(out, vol, atol=1e-5)


def test_matches_scipy_linear():
    rng = np.random.default_rng(1)
    vol = rng.normal(size=(12, 12, 12))
    in_aff = np.diag([1.0, 1.0, 2.0, 1.0])
    in_aff[:3, 3] = [1, -2, 3]
    out_aff = np.diag([1.5, 1.0, 1.0, 1.0])
    out_aff[:3, 3] = [0, 0, 1]
    out_shape = (10, 14, 20)
    ours = affine_resample(vol, in_aff, out_aff, out_shape, "linear", mode="constant")
    M = np.linalg.inv(in_aff) @ out_aff
    ref = affine_transform(vol, M[:3, :3], offset=M[:3, 3], output_shape=out_shape,
                           order=1, mode="constant", cval=0.0)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_matches_scipy_nearest():
    rng = np.random.default_rng(2)
    vol = rng.normal(size=(10, 10, 10))
    out_aff = np.diag([0.8, 1.1, 1.0, 1.0])
    out_shape = (12, 9, 10)
    ours = affine_resample(vol, np.eye(4), out_aff, out_shape, "nn", mode="nearest")
    M = out_aff.copy()
    ref = affine_transform(vol, M[:3, :3], offset=M[:3, 3], output_shape=out_shape,
                           order=0, mode="nearest")
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_spline_path_runs():
    vol = np.random.default_rng(3).normal(size=(8, 8, 8))
    out = affine_resample(vol, np.eye(4), np.diag([2.0, 2, 2, 1]), (4, 4, 4), "spline")
    assert out.shape == (4, 4, 4)


def test_resample_nib_mm():
    # 2 mm voxels resampled to 1 mm doubles the grid
    vol = np.random.default_rng(4).normal(size=(8, 8, 8))
    img = nifti.NiftiImage(vol, np.diag([2.0, 2.0, 2.0, 1.0]))
    out = resample_nib(img, new_size=[1, 1, 1], new_size_type="mm", interpolation="linear")
    assert out.shape == (16, 16, 16)
    zooms = np.sqrt((np.asarray(out.affine)[:3, :3] ** 2).sum(0))
    np.testing.assert_allclose(zooms, 1.0)


def test_resample_nib_factor_and_vox():
    vol = np.zeros((8, 8, 8))
    img = nifti.NiftiImage(vol, np.eye(4))
    out = resample_nib(img, new_size=[2], new_size_type="factor")
    assert out.shape == (16, 16, 16)
    out = resample_nib(img, new_size=[4, 5, 6], new_size_type="vox")
    assert out.shape == (4, 5, 6)


def test_resample_nib_dest():
    vol = np.random.default_rng(5).normal(size=(8, 8, 8))
    img = nifti.NiftiImage(vol, np.eye(4))
    dest = nifti.NiftiImage(np.zeros((4, 4, 4)), np.diag([2.0, 2, 2, 1]))
    out = resample_nib(img, image_dest=dest, interpolation="linear")
    assert out.shape == (4, 4, 4)
    np.testing.assert_allclose(out.affine, dest.affine)


def test_resample_nib_4d():
    vol = np.random.default_rng(6).normal(size=(6, 6, 6, 3))
    img = nifti.NiftiImage(vol, np.eye(4))
    out = resample_nib(img, new_size=[2], new_size_type="factor")
    assert out.shape == (12, 12, 12, 3)


def test_pad_or_crop():
    x = np.arange(27.0).reshape(3, 3, 3)
    padded = pad_or_crop(x, (5, 5, 5))
    np.testing.assert_array_equal(padded[:3, :3, :3], x)
    assert padded[3:].sum() == 0
    cropped = pad_or_crop(x, (2, 2, 2))
    np.testing.assert_array_equal(cropped, x[:2, :2, :2])
