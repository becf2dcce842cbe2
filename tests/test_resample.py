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


class TestDeviceSpline:
    """Device (matmul) order-3 path must match host scipy <= 1e-4 for every
    scaled-permutation map (VERDICT r2 item 6)."""

    def _scipy_ref(self, vol, in_aff, out_aff, out_shape, mode):
        M = np.linalg.inv(in_aff) @ out_aff
        return affine_transform(
            np.asarray(vol, np.float64), M[:3, :3], offset=M[:3, 3],
            output_shape=out_shape, order=3, mode=mode, cval=0.0)

    def _check(self, vol, in_aff, out_aff, out_shape, mode, require_device=True):
        from multimodal_registration_tpu.ops import resample as R

        M = np.linalg.inv(in_aff) @ out_aff
        dev = R._device_spline_resample(vol, M, out_shape, mode, 0.0)
        if require_device:
            assert dev is not None, "expected the device spline path to engage"
        ours = affine_resample(vol, in_aff, out_aff, out_shape, "spline", mode=mode)
        ref = self._scipy_ref(vol, in_aff, out_aff, out_shape, mode)
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_1mm_resample_golden(self):
        # the preprocessing case: 2 mm voxels onto a 1 mm grid
        rng = np.random.default_rng(10)
        vol = rng.normal(size=(9, 10, 11))
        in_aff = np.diag([2.0, 2.0, 2.0, 1.0])
        in_aff[:3, 3] = [3, -1, 2]
        out_aff = np.eye(4)
        out_aff[:3, 3] = [3, -1, 2]
        for mode in ("nearest", "constant"):
            self._check(vol, in_aff, out_aff, (18, 20, 22), mode)

    def test_downsample_with_offset(self):
        rng = np.random.default_rng(11)
        vol = rng.normal(size=(16, 12, 14))
        out_aff = np.diag([1.7, 2.3, 1.1, 1.0])
        out_aff[:3, 3] = [0.4, -0.2, 1.3]
        for mode in ("nearest", "constant"):
            self._check(vol, np.eye(4), out_aff, (9, 6, 12), mode)

    def test_permutation_and_flip(self):
        # axis permutation with a sign flip is still a scaled permutation
        rng = np.random.default_rng(12)
        vol = rng.normal(size=(10, 11, 12))
        out_aff = np.zeros((4, 4))
        out_aff[0, 1] = 1.5   # in_x <- out_y
        out_aff[1, 0] = -1.0  # in_y <- -out_x
        out_aff[2, 2] = 0.8
        out_aff[:3, 3] = [2.0, 9.0, 0.5]
        out_aff[3, 3] = 1.0
        for mode in ("nearest", "constant"):
            self._check(vol, np.eye(4), out_aff, (8, 9, 10), mode)

    def test_env_disable(self, monkeypatch):
        from multimodal_registration_tpu.ops import resample as R

        monkeypatch.setenv("MMREG_SPLINE_DEVICE", "0")
        vol = np.zeros((4, 4, 4))
        assert R._device_spline_resample(vol, np.eye(4), (4, 4, 4), "nearest", 0.0) is None


class TestObliqueDeviceSpline:
    """Device 64-tap path for non-separable (oblique) maps must match host
    scipy <= 1e-4 (VERDICT r3 item 7). The prefilter operators and boundary
    semantics were probed to float64-exactness; the tolerance here covers the
    float32 device evaluation."""

    def _rot(self, th, ph=0.0):
        rot = np.eye(4)
        c, s = np.cos(th), np.sin(th)
        rot[:2, :2] = [[c, -s], [s, c]]
        if ph:
            r2 = np.eye(4)
            c2, s2 = np.cos(ph), np.sin(ph)
            r2[1:3, 1:3] = [[c2, -s2], [s2, c2]]
            rot = rot @ r2
        return rot

    def _check(self, vol, in_aff, out_aff, out_shape, mode, order=3):
        from scipy.ndimage import affine_transform

        from multimodal_registration_tpu.ops import resample as R

        M = np.linalg.inv(in_aff) @ out_aff
        dev = R._device_spline_resample(vol, M, out_shape, mode, 0.0, order)
        assert dev is not None, "expected the oblique device path to engage"

        def _one(v3):
            return affine_transform(
                np.asarray(v3, np.float64), M[:3, :3], offset=M[:3, 3],
                output_shape=out_shape, order=order, mode=mode, cval=0.0)

        ref = (np.stack([_one(vol[..., c]) for c in range(vol.shape[3])], -1)
               if vol.ndim == 4 else _one(vol))
        np.testing.assert_allclose(dev, ref, atol=1e-4)

    def test_rotation_golden(self):
        rng = np.random.default_rng(13)
        vol = rng.normal(size=(12, 11, 13))
        rot = self._rot(0.3, 0.15)
        rot[:3, 3] = [1.0, -0.5, 0.3]
        for mode in ("nearest", "constant"):
            for order in (2, 3):
                self._check(vol, np.eye(4), rot, (12, 11, 13), mode, order)

    def test_rotation_with_scale_and_field_channels(self):
        # a (X,Y,Z,3) displacement field resamples in ONE device call
        rng = np.random.default_rng(14)
        field = rng.normal(size=(10, 12, 9, 3))
        out_aff = self._rot(-0.2) @ np.diag([1.4, 0.8, 1.1, 1.0])
        out_aff[:3, 3] = [0.7, 2.0, -1.0]
        for mode in ("nearest", "constant"):
            self._check(field, np.eye(4), out_aff, (9, 10, 11), mode)

    def test_far_outside_coordinates(self):
        # output grid mostly outside the input extent exercises the
        # boundary folding on both modes
        rng = np.random.default_rng(15)
        vol = rng.normal(size=(8, 8, 8))
        out_aff = self._rot(0.4)
        out_aff[:3, 3] = [-9.0, 6.0, -4.0]
        for mode in ("nearest", "constant"):
            self._check(vol, np.eye(4), out_aff, (14, 14, 14), mode)

    def test_oblique_env_pin_to_host(self, monkeypatch):
        from multimodal_registration_tpu.ops import resample as R

        monkeypatch.setenv("MMREG_SPLINE_OBLIQUE", "0")
        rot = self._rot(0.3)
        vol = np.zeros((6, 6, 6))
        assert R._device_spline_resample(vol, rot, (6, 6, 6), "nearest", 0.0) is None
        # the public API still answers via host scipy
        out = affine_resample(vol + 1.0, np.eye(4), rot, (6, 6, 6), "spline",
                              mode="nearest")
        assert out.shape == (6, 6, 6)

    def test_unsupported_mode_falls_back(self):
        from multimodal_registration_tpu.ops import resample as R

        rot = self._rot(0.2)
        vol = np.zeros((6, 6, 6))
        assert R._device_spline_resample(vol, rot, (6, 6, 6), "mirror", 0.0) is None


class TestSplineCval:
    """cval != 0 through BOTH device spline paths (round-5 VERDICT item 5):
    scipy's 'constant' output is exactly linear in cval — the cval=0 result
    plus cval on the outside-coordinate mask (probed bit-for-bit vs scipy
    1.17, orders 2/3) — so the device paths no longer bail to host scipy."""

    def _check(self, vol, out_aff, out_shape, mode, cval, order):
        from multimodal_registration_tpu.ops import resample as R

        interp = {2: "spline2", 3: "spline"}[order]
        M = out_aff
        dev = R._device_spline_resample(vol, M, out_shape, mode, cval, order)
        assert dev is not None, "expected the device path to engage"
        got = affine_resample(vol, np.eye(4), out_aff, out_shape, interp,
                              mode=mode, cval=cval)

        def _one(v3):
            return affine_transform(
                np.asarray(v3, np.float64), M[:3, :3], offset=M[:3, 3],
                output_shape=out_shape, order=order, mode=mode, cval=cval)

        ref = (np.stack([_one(vol[..., c]) for c in range(vol.shape[3])], -1)
               if vol.ndim == 4 else _one(vol))
        np.testing.assert_allclose(got, ref, atol=1e-4)
        np.testing.assert_allclose(dev, ref, atol=1e-4)

    def test_separable_cval(self):
        rng = np.random.default_rng(21)
        vol = rng.normal(size=(14, 12, 10))
        out_aff = np.diag([2.0, 0.5, 1.0, 1.0])
        out_aff[:3, 3] = [-1.0, 0.5, 4.0]  # pushes coordinates outside
        for order in (2, 3):
            self._check(vol, out_aff, (16, 13, 11), "constant", 3.7, order)

    def test_separable_cval_field_channels(self):
        rng = np.random.default_rng(22)
        field = rng.normal(size=(10, 12, 9, 3))
        out_aff = np.diag([1.4, 0.8, 1.1, 1.0])
        out_aff[:3, 3] = [0.7, 2.0, -12.0]
        self._check(field, out_aff, (9, 10, 11), "constant", -1.5, 3)

    def test_oblique_cval(self):
        rng = np.random.default_rng(23)
        vol = rng.normal(size=(12, 11, 13))
        c, s = np.cos(0.3), np.sin(0.3)
        rot = np.eye(4)
        rot[:2, :2] = [[c, -s], [s, c]]
        rot[:3, 3] = [6.0, -3.5, 0.3]
        for order in (2, 3):
            self._check(vol, rot, (12, 11, 13), "constant", 2.25, order)

    def test_nearest_ignores_cval(self):
        # scipy ignores cval outside 'constant' mode (probed); the device
        # path must too instead of bailing to host
        rng = np.random.default_rng(24)
        vol = rng.normal(size=(9, 8, 7))
        out_aff = np.diag([1.5, 1.0, 0.9, 1.0])
        out_aff[:3, 3] = [-2.0, 1.0, 3.0]
        self._check(vol, out_aff, (9, 9, 9), "nearest", 7.0, 3)


class TestObliqueSlab:
    """Over-budget oblique spline gathers slab the coefficient volume along x
    from an exact host-side plan (round-5 VERDICT item 5) instead of falling
    back to host scipy; only strong rotations no slab can cover still do."""

    def _rot(self, deg):
        th = np.deg2rad(deg)
        rot = np.eye(4)
        c, s = np.cos(th), np.sin(th)
        rot[:2, :2] = [[c, -s], [s, c]]
        return rot

    def test_slab_matches_scipy(self, monkeypatch):
        from multimodal_registration_tpu.ops import resample as R

        rng = np.random.default_rng(25)
        vol = rng.normal(size=(40, 24, 20))
        out_aff = self._rot(6.0)
        out_aff[:3, 3] = [-1.5, 0.8, 0.3]
        out_shape = (40, 24, 20)
        for mode, cval, npad in (("constant", 2.2, 0), ("nearest", 0.0, 12)):
            nyc, nzc = 24 + 2 * npad, 20 + 2 * npad
            budget = 14 * nyc * nzc * 128 * 4  # ~14 slab planes
            plan = R._oblique_slab_plan(
                out_aff, out_shape, (40 + 2 * npad, nyc, nzc), 3, mode, npad,
                budget)
            assert plan is not None and plan[1] <= 14
            monkeypatch.setenv("MMREG_GATHER_SRC_BUDGET", str(budget))
            monkeypatch.setenv("MMREG_SPLINE_SLAB", "1")
            got = affine_resample(vol, np.eye(4), out_aff, out_shape, "spline",
                                  mode=mode, cval=cval)
            monkeypatch.delenv("MMREG_GATHER_SRC_BUDGET")
            M = out_aff
            ref = affine_transform(vol, M[:3, :3], offset=M[:3, 3],
                                   output_shape=out_shape, order=3, mode=mode,
                                   cval=cval)
            np.testing.assert_allclose(got, ref, atol=1e-4)

    def test_field_channels_through_slab(self, monkeypatch):
        rng = np.random.default_rng(26)
        field = rng.normal(size=(40, 24, 20, 3))
        out_aff = self._rot(4.0)
        out_shape = (40, 24, 20)
        monkeypatch.setenv("MMREG_GATHER_SRC_BUDGET",
                           str(14 * 24 * 20 * 128 * 4))
        monkeypatch.setenv("MMREG_SPLINE_SLAB", "1")
        got = affine_resample(field, np.eye(4), out_aff, out_shape, "spline",
                              mode="constant", cval=1.1)
        M = out_aff
        ref = np.stack([
            affine_transform(field[..., c], M[:3, :3], offset=M[:3, 3],
                             output_shape=out_shape, order=3, mode="constant",
                             cval=1.1) for c in range(3)], -1)
        np.testing.assert_allclose(got, ref, atol=1e-4)

    def test_strong_rotation_falls_to_host(self, monkeypatch):
        from multimodal_registration_tpu.ops import resample as R

        vol = np.random.default_rng(27).normal(size=(40, 24, 20))
        out_aff = self._rot(60.0)
        budget = 8 * 24 * 20 * 128 * 4
        assert R._oblique_slab_plan(out_aff, (40, 24, 20), (40, 24, 20), 3,
                                    "constant", 0, budget) is None
        monkeypatch.setenv("MMREG_GATHER_SRC_BUDGET", str(budget))
        # over budget WITHOUT MMREG_SPLINE_SLAB=1 -> host (the measured
        # default, PERF.md round 5), regardless of rotation strength
        assert R._device_spline_resample(vol, out_aff, (40, 24, 20),
                                         "constant", 0.0, 3) is None
        # opted in, the 60-degree rotation has no feasible plan -> still host
        monkeypatch.setenv("MMREG_SPLINE_SLAB", "1")
        assert R._device_spline_resample(vol, out_aff, (40, 24, 20),
                                         "constant", 0.0, 3) is None
        # the public API still answers — host scipy, hence exact
        got = affine_resample(vol, np.eye(4), out_aff, (40, 24, 20), "spline",
                              mode="constant")
        ref = affine_transform(vol, out_aff[:3, :3], offset=out_aff[:3, 3],
                               output_shape=(40, 24, 20), order=3,
                               mode="constant", cval=0.0)
        np.testing.assert_allclose(got, ref, atol=0)


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


def test_resample_nib_4d_three_elem_size():
    """Reference parity: 3-element new_size on 4-D appends a unit 4th dim
    (`bids_registration.py:59-60`)."""
    vol = np.random.default_rng(7).normal(size=(6, 6, 6, 2))
    img = nifti.NiftiImage(vol, np.eye(4))
    out = resample_nib(img, new_size=[2, 2, 1], new_size_type="factor")
    assert out.shape == (12, 12, 6, 2)


def test_resample_nib_spline_is_quadratic():
    """resample_nib 'spline' must be order 2 (dict_interp,
    `bids_registration.py:46`) — NOT the postprocess cubic."""
    from scipy.ndimage import affine_transform

    vol = np.random.default_rng(8).normal(size=(9, 9, 9))
    img = nifti.NiftiImage(vol, np.eye(4))
    out = resample_nib(img, new_size=[0.5, 0.5, 0.5], new_size_type="mm",
                       interpolation="spline")
    M = np.diag([0.5, 0.5, 0.5])
    ref2 = affine_transform(vol, M, output_shape=out.shape, order=2,
                            mode="nearest")
    ref3 = affine_transform(vol, M, output_shape=out.shape, order=3,
                            mode="nearest")
    d2 = float(np.max(np.abs(np.asarray(out.get_fdata()) - ref2)))
    d3 = float(np.max(np.abs(np.asarray(out.get_fdata()) - ref3)))
    assert d2 <= 1e-4, f"order-2 mismatch {d2}"
    assert d3 > 1e-3, "output indistinguishable from cubic — wrong order"
