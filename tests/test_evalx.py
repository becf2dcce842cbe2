"""Evaluation-kernel tests vs scipy/numpy golden values and reference formulas."""

import csv
import os

import numpy as np
import pytest
from scipy.stats import entropy as scipy_entropy

from multimodal_registration_tpu import evalx
from multimodal_registration_tpu.utils import nifti


class TestOverlap:
    def test_perfect_overlap(self):
        seg = np.zeros((10, 10, 10))
        seg[3:7, 3:7, 3:7] = 1
        m = evalx.overlap_metrics(seg, seg)
        assert m["dice"] == 1.0
        assert m["jaccard"] == 1.0
        assert m["sensitivity"] == 1.0
        assert m["precision"] == 1.0

    def test_no_overlap(self):
        a = np.zeros((10, 10, 10))
        b = np.zeros((10, 10, 10))
        a[:2], b[8:] = 1, 1
        m = evalx.overlap_metrics(a, b)
        assert m["dice"] == 0.0

    def test_against_reference_formulas(self):
        rng = np.random.default_rng(0)
        fx = (rng.random((12, 12, 12)) > 0.7).astype(float)
        sg = (rng.random((12, 12, 12)) > 0.7).astype(float)
        m = evalx.overlap_metrics(fx, sg)
        # direct reference formulas (eval_reg_on_sc_seg.py:80-124)
        TP = np.sum(sg[fx == 1])
        FP = np.sum(sg[fx == 0])
        TN = len(np.ravel(sg[fx == 0])) - np.sum(sg[fx == 0])
        FN = len(np.ravel(sg[fx == 1])) - np.sum(sg[fx == 1])
        assert m["tp"] == TP and m["fp"] == FP and m["tn"] == TN and m["fn"] == FN
        np.testing.assert_allclose(m["dice"], 2 * TP / (2 * TP + FP + FN))
        np.testing.assert_allclose(m["precision"], TP / np.sum(sg))


class TestNMI:
    def test_matches_numpy_histogramdd(self):
        rng = np.random.default_rng(1)
        a = rng.random((16, 16, 16))
        b = a * 0.5 + rng.random((16, 16, 16)) * 0.5
        ours = evalx.normalized_mutual_information(a, b)
        hist, _ = np.histogramdd([a.reshape(-1), b.reshape(-1)], bins=100)
        ref = (scipy_entropy(hist.sum(0)) + scipy_entropy(hist.sum(1))) / scipy_entropy(
            hist.reshape(-1)
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-3)

    def test_identical_images_high_nmi(self):
        rng = np.random.default_rng(2)
        a = rng.random((12, 12, 12))
        assert evalx.normalized_mutual_information(a, a) > 1.9

    def test_detect_zero_padding(self):
        im = np.zeros((10, 10, 10))
        im[2:8, 3:7, 1:9] = 1.0
        x0, y0, z0, x1, y1, z1 = evalx.detect_zero_padding(im)
        assert (x0, y0, z0, x1, y1, z1) == (2, 3, 1, 7, 6, 8)


class TestJacobian:
    def test_identity_field_det_one(self):
        ddf = np.zeros((12, 12, 12, 1, 3))
        s = evalx.folding_summary(ddf)
        np.testing.assert_allclose(s["mean_detJa"], 1.0, atol=1e-6)
        assert s["percentage_negative_detJa"] == 0.0
        assert s["n_total_detJa"] == 8 * 8 * 8

    def test_linear_scaling_field(self):
        # phi(x) = 0.5x along x → J = diag(1.5, 1, 1) → det 1.5
        X = np.arange(16, dtype=float)
        ddf = np.zeros((16, 12, 12, 3))
        ddf[..., 0] = X[:, None, None] * 0.5
        s = evalx.folding_summary(ddf)
        np.testing.assert_allclose(s["mean_detJa"], 1.5, atol=1e-5)

    def test_folding_detected(self):
        # strong negative gradient creates folding
        X = np.arange(16, dtype=float)
        ddf = np.zeros((16, 12, 12, 3))
        ddf[..., 0] = -2.0 * X[:, None, None]
        s = evalx.folding_summary(ddf)
        assert s["percentage_negative_detJa"] == 100.0

    def test_against_reference_numpy(self):
        rng = np.random.default_rng(3)
        ddf = rng.normal(scale=0.5, size=(12, 12, 12, 1, 3))
        ours = evalx.jacobian_determinant(ddf)
        # reference implementation (eval_reg_with_jacobian.py:62-74)
        h, w, d, t, c = ddf.shape
        nv = (h - 4) * (w - 4) * (d - 4)
        dx = np.reshape((ddf[:-4, 2:-2, 2:-2] - 8 * ddf[1:-3, 2:-2, 2:-2] + 8 * ddf[3:-1, 2:-2, 2:-2] - ddf[4:, 2:-2, 2:-2]) / 12.0, [nv, c])
        dy = np.reshape((ddf[2:-2, :-4, 2:-2] - 8 * ddf[2:-2, 1:-3, 2:-2] + 8 * ddf[2:-2, 3:-1, 2:-2] - ddf[2:-2, 4:, 2:-2]) / 12.0, [nv, c])
        dz = np.reshape((ddf[2:-2, 2:-2, :-4] - 8 * ddf[2:-2, 2:-2, 1:-3] + 8 * ddf[2:-2, 2:-2, 3:-1] - ddf[2:-2, 2:-2, 4:]) / 12.0, [nv, c])
        J = np.stack([dx, dy, dz], 2)
        J[:, 0, 0] += 1
        J[:, 1, 1] += 1
        J[:, 2, 2] += 1
        ref = np.linalg.det(J)
        np.testing.assert_allclose(ours.reshape(-1), ref, atol=1e-4)


class TestEvalCLIs:
    def _save(self, path, data):
        nifti.save(nifti.NiftiImage(np.asarray(data, np.float32), np.eye(4)), str(path))

    def test_sc_seg_cli_and_gate(self, tmp_path):
        from multimodal_registration_tpu.evalx.cli import eval_on_sc_seg

        seg = np.zeros((10, 10, 10))
        seg[3:7, 3:7, 3:7] = 1
        bad = np.zeros((10, 10, 10))
        bad[0:2, 0:2, 0:2] = 1
        self._save(tmp_path / "fx.nii.gz", seg)
        self._save(tmp_path / "mov.nii.gz", bad)
        self._save(tmp_path / "moved.nii.gz", seg)
        out = str(tmp_path / "m.csv")
        rc = eval_on_sc_seg([
            "--fx-seg-path", str(tmp_path / "fx.nii.gz"),
            "--moving-seg-path", str(tmp_path / "mov.nii.gz"),
            "--warped-seg-path", str(tmp_path / "moved.nii.gz"),
            "--sub-id", "sub-01", "--out-file", out,
        ])
        assert rc == 0
        rows = list(csv.reader(open(out)))
        assert rows[0][0] == "Timestamp" and rows[1][1] == "sub-01"
        assert float(rows[1][3]) == 1.0  # dice after
        # gate: moved=bad, min-dice 80, not last eval → exit 1
        rc = eval_on_sc_seg([
            "--fx-seg-path", str(tmp_path / "fx.nii.gz"),
            "--moving-seg-path", str(tmp_path / "mov.nii.gz"),
            "--warped-seg-path", str(tmp_path / "mov.nii.gz"),
            "--sub-id", "sub-01", "--out-file", out,
            "--min-dice", "80", "--last-eval", "0",
        ])
        assert rc == 1

    def test_nmi_cli(self, tmp_path):
        from multimodal_registration_tpu.evalx.cli import eval_with_mi

        rng = np.random.default_rng(0)
        a = rng.random((10, 10, 10)) + 0.1
        self._save(tmp_path / "fx.nii.gz", a)
        self._save(tmp_path / "mov.nii.gz", a * 2)
        self._save(tmp_path / "moved.nii.gz", a * 2)
        out = str(tmp_path / "nmi.csv")
        rc = eval_with_mi([
            "--fx-im-path", str(tmp_path / "fx.nii.gz"),
            "--moving-im-path", str(tmp_path / "mov.nii.gz"),
            "--warped-im-path", str(tmp_path / "moved.nii.gz"),
            "--sub-id", "s", "--out-file", out,
        ])
        assert rc == 0
        rows = list(csv.reader(open(out)))
        assert len(rows) == 2 and rows[0][2] == "NMI_before_registration"

    def test_jacobian_cli(self, tmp_path):
        from multimodal_registration_tpu.evalx.cli import eval_with_jacobian

        field = np.zeros((12, 12, 12, 1, 3))
        self._save(tmp_path / "warp.nii.gz", field)
        out = str(tmp_path / "jac.csv")
        rc = eval_with_jacobian([
            "--def-field-path", str(tmp_path / "warp.nii.gz"),
            "--sub-id", "s", "--out-file", out,
            "--out-im-path", str(tmp_path / "detJa.nii.gz"),
        ])
        assert rc == 0
        assert os.path.exists(tmp_path / "detJa.nii.gz")
        det = nifti.load(str(tmp_path / "detJa.nii.gz"))
        assert det.shape == (8, 8, 8, 1)
        rows = list(csv.reader(open(out)))
        assert float(rows[1][2]) == 0.0  # no folding


def test_nmi_host_matches_device(monkeypatch):
    """Host (default) and device (MMREG_EVAL_DEVICE) NMI paths agree."""
    rng = np.random.default_rng(7)
    a = rng.random((24, 20, 16))
    b = 0.5 * a + 0.5 * rng.random((24, 20, 16))
    host = evalx.normalized_mutual_information(a, b)
    monkeypatch.setenv("MMREG_EVAL_DEVICE", "1")
    dev = evalx.normalized_mutual_information(a, b)
    assert abs(host - dev) < 1e-5


def test_jacobian_host_matches_device(monkeypatch):
    from multimodal_registration_tpu.evalx.jacobian import jacobian_determinant

    rng = np.random.default_rng(8)
    field = rng.standard_normal((16, 14, 12, 3)).astype(np.float32)
    host = jacobian_determinant(field)
    monkeypatch.setenv("MMREG_EVAL_DEVICE", "1")
    dev = jacobian_determinant(field)
    np.testing.assert_allclose(host, dev, rtol=1e-5, atol=1e-5)
