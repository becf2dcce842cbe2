"""Batch-pipeline tests on a synthetic BIDS dataset (CPU, threshold segmenter)."""

import json
import os

import numpy as np
import pytest

from multimodal_registration_tpu.infer.config import InferenceConfig
from multimodal_registration_tpu.models.vxm_dense import VxmConfig, params_template
from multimodal_registration_tpu.pipeline import (
    ThresholdSegmenter,
    centermass_affine_field,
    discover_subjects,
    run_batch,
    subject_images,
)
from multimodal_registration_tpu.train.trainer import _flatten_params
from multimodal_registration_tpu.utils import nifti


def _cord_vol(shape=(40, 40, 32), shift=(0, 0), seed=0, bright=3.0):
    rng = np.random.default_rng(seed)
    g = np.stack(np.meshgrid(*[np.linspace(-1, 1, s) for s in shape[:2]], indexing="ij"), 0)
    cx, cy = shift
    tube = np.exp(-(((g[0] - cx) ** 2 + (g[1] - cy) ** 2)) * 30) * bright
    vol = tube[..., None] * np.ones(shape[2]) + 0.1 * rng.random(shape)
    return vol.astype(np.float32)


def _make_bids(tmp_path, subjects=("sub-01", "sub-02")):
    data = tmp_path / "data"
    for i, sub in enumerate(subjects):
        anat = data / sub / "anat"
        os.makedirs(anat)
        aff = np.eye(4)
        nifti.save(nifti.NiftiImage(_cord_vol(seed=i), aff), str(anat / f"{sub}_T2w.nii.gz"))
        nifti.save(
            nifti.NiftiImage(_cord_vol(shift=(0.15, 0.0), seed=i + 10), aff),
            str(anat / f"{sub}_T1w.nii.gz"),
        )
    return str(data)


def _weights(tmp_path):
    p = params_template(VxmConfig(enc=(4,) * 4, dec=(4,) * 6, compute_dtype="float32"))
    path = str(tmp_path / "w.npz")
    np.savez(path, **_flatten_params(p))
    return path


def test_discover_and_files(tmp_path):
    data = _make_bids(tmp_path)
    subs = discover_subjects(data)
    assert subs == ["sub-01", "sub-02"]
    imgs = subject_images(data, "sub-01")
    assert set(imgs.files) == {"T1w", "T2w"}


def test_discover_sessions(tmp_path):
    anat = tmp_path / "data" / "sub-03" / "ses-01" / "anat"
    os.makedirs(anat)
    nifti.save(nifti.NiftiImage(np.zeros((8, 8, 8), np.float32), np.eye(4)),
               str(anat / "sub-03_ses-01_T1w.nii.gz"))
    subs = discover_subjects(str(tmp_path / "data"))
    assert subs == ["sub-03/ses-01"]
    imgs = subject_images(str(tmp_path / "data"), "sub-03/ses-01")
    assert "T1w" in imgs.files


def test_centermass_affine_field():
    fx = np.zeros((20, 20, 8))
    mv = np.zeros((20, 20, 8))
    fx[8:12, 8:12, :] = 1
    mv[12:16, 10:14, :] = 1  # shifted +4 in x, +2 in y
    field = centermass_affine_field(fx, mv)
    # phi = com_mov - com_fx = (+4, +2): sampling mov at x+4 re-centers it
    np.testing.assert_allclose(field[..., 0], 4.0, atol=1e-6)
    np.testing.assert_allclose(field[..., 1], 2.0, atol=1e-6)
    np.testing.assert_allclose(field[..., 2], 0.0)


def test_rigid_affine_field_recovers_rotation():
    """The opt-in rigid fallback recovers a known in-plane rotation +
    translation that slice-wise centermass cannot (its field carries no
    rotation by construction) — benchmarks/opt_affine_rotation_study.py."""
    from scipy import ndimage

    from multimodal_registration_tpu.pipeline.segment import rigid_affine_field

    rng = np.random.default_rng(0)
    fx = np.zeros((48, 48, 24))
    # an anisotropic blob (distinct principal axes) off-center
    fx[14:34, 20:28, 4:20] = 1.0
    ang = 8.0  # degrees about z
    mv = ndimage.rotate(fx, ang, axes=(0, 1), reshape=False, order=1)
    mv = ndimage.shift(mv, (3.0, -2.0, 1.0), order=1)
    mv = (mv > 0.5).astype(np.float64)

    field = rigid_affine_field(fx, mv)
    # resample mv at x + phi(x): grid + field indexes into moving space
    grid = np.stack(np.meshgrid(*[np.arange(s, dtype=np.float64)
                                  for s in fx.shape], indexing="ij"), -1)
    coords = (grid + field).transpose(3, 0, 1, 2)
    moved = ndimage.map_coordinates(mv, coords, order=1)

    def dice(a, b):
        a, b = a > 0.5, b > 0.5
        return 2.0 * np.logical_and(a, b).sum() / (a.sum() + b.sum())

    d_before = dice(fx, mv)
    d_rigid = dice(fx, moved)
    cm = centermass_affine_field(fx, mv)
    coords_cm = (grid + cm).transpose(3, 0, 1, 2)
    d_cm = dice(fx, ndimage.map_coordinates(mv, coords_cm, order=1))
    assert d_rigid > 0.97, (d_before, d_cm, d_rigid)
    assert d_rigid > d_cm + 0.02  # rotation actually recovered


def test_threshold_segmenter(tmp_path):
    vol = _cord_vol()
    p = str(tmp_path / "v.nii.gz")
    nifti.save(nifti.NiftiImage(vol, np.eye(4)), p)
    seg_p = ThresholdSegmenter()(p, "T2w", str(tmp_path / "seg.nii.gz"))
    seg = nifti.load(seg_p).get_fdata()
    assert seg.sum() > 0
    assert set(np.unique(seg)) <= {0.0, 1.0}


def test_run_batch_with_config_and_opt_affine(tmp_path):
    data = _make_bids(tmp_path)
    cfgp = str(tmp_path / "cfg.json")
    with open(cfgp, "w") as f:
        json.dump(dict(enc=[4] * 4, dec=[4] * 6, compute_dtype="float32"), f)
    out = str(tmp_path / "out2")
    results, summary = run_batch(
        data, out, _weights(tmp_path),
        config_path=cfgp, jobs=1,
        fx_contrast="T2w", mov_contrast="T1w",
        opt_affine=True, min_sc_dice=80,
    )
    assert summary["n_subjects"] == 2
    assert summary["n_ok"] == 2, [r.error for r in results]
    # CSVs written
    csv_dir = os.path.join(out, "data_processed")
    for f in ("metrics_on_sc_seg.csv", "nmi.csv", "jacobian_det.csv"):
        assert os.path.exists(os.path.join(csv_dir, f)), f
    # QC report
    assert os.path.exists(os.path.join(out, "qc", "index.html"))
    # per-subject logs + summary
    assert os.path.exists(os.path.join(out, "log", "sub-01.log"))
    assert os.path.exists(os.path.join(out, "batch_summary.json"))
    # per-phase latency attribution (pipeline_throughput bench contract)
    for r in results:
        for phase in ("register", "segment", "evaluate", "qc", "reorganize",
                      "register.predict", "register.postprocess"):
            assert phase in r.timings, (r.subject, sorted(r.timings))


def test_reorganized_output_layout(tmp_path):
    data = _make_bids(tmp_path, subjects=("sub-09",))
    cfgp = str(tmp_path / "cfg.json")
    with open(cfgp, "w") as f:
        json.dump(dict(enc=[4] * 4, dec=[4] * 6, compute_dtype="float32"), f)
    out = str(tmp_path / "out3")
    results, summary = run_batch(
        data, out, _weights(tmp_path), config_path=cfgp,
        fx_contrast="T2w", mov_contrast="T1w",
    )
    assert summary["n_ok"] == 1, [r.error for r in results]
    work = os.path.join(out, "data_processed", "sub-09")
    # origin/: originals; res/: processed fixed + moved; seg/ + add_res/: rest
    assert os.path.exists(os.path.join(work, "origin", "sub-09_T2w.nii.gz"))
    assert os.path.exists(os.path.join(work, "res", "sub-09_T2w_proc.nii.gz"))
    assert os.path.exists(os.path.join(work, "res", "sub-09_T1w_proc_reg_to_T2w.nii.gz"))
    assert os.path.isdir(os.path.join(work, "seg"))
    assert os.path.isdir(os.path.join(work, "add_res"))
    # no stray volumes at the top level
    strays = [f for f in os.listdir(work) if f.endswith(".nii.gz")]
    assert strays == []


def test_qc_report_content(tmp_path):
    from multimodal_registration_tpu.pipeline.qc import QCReport

    vols = {}
    for name in ("fx", "mov", "moved"):
        p = str(tmp_path / f"{name}.nii.gz")
        nifti.save(nifti.NiftiImage(_cord_vol(seed=len(vols)), np.eye(4)), p)
        vols[name] = p
    seg = str(tmp_path / "seg.nii.gz")
    nifti.save(nifti.NiftiImage((_cord_vol() > 1.0).astype(np.uint8), np.eye(4)), seg)

    qc = QCReport(str(tmp_path / "qc"), title="Test QC")
    qc.add_subject(
        "sub-77", vols["fx"], vols["mov"], vols["moved"],
        seg_paths={"fixed": seg}, metrics={"dice_after": 0.91},
    )
    out = qc.write()
    html_text = open(out).read()
    assert "sub-77" in html_text
    assert "dice_after" in html_text
    assert html_text.count("data:image/png;base64") == 3


def test_run_batch_two_step(tmp_path):
    data = _make_bids(tmp_path, subjects=("sub-21",))
    cfgp = str(tmp_path / "cfg.json")
    with open(cfgp, "w") as f:
        json.dump(dict(enc=[4] * 4, dec=[4] * 6, compute_dtype="float32"), f)
    out = str(tmp_path / "out_ts")
    results, summary = run_batch(
        data, out, _weights(tmp_path), model2_path=_weights(tmp_path),
        config_path=cfgp, fx_contrast="T2w", mov_contrast="T1w",
    )
    assert summary["n_ok"] == 1, [r.error for r in results]


def test_filter_subjects():
    from multimodal_registration_tpu.pipeline.batch import filter_subjects

    subs = ["sub-01", "sub-02", "sub-03/ses-01", "sub-10"]
    assert filter_subjects(subs) == subs
    assert filter_subjects(subs, include=["sub-0"]) == ["sub-01", "sub-02", "sub-03/ses-01"]
    assert filter_subjects(subs, exclude=["ses-"]) == ["sub-01", "sub-02", "sub-10"]
    assert filter_subjects(subs, include_list=["sub-02", "sub-03"]) == ["sub-02", "sub-03/ses-01"]
    assert filter_subjects(subs, exclude_list=["sub-10"]) == ["sub-01", "sub-02", "sub-03/ses-01"]
    # regex include (sct_run_batch passes regexes)
    assert filter_subjects(subs, include=[r"sub-0[12]$"]) == ["sub-01", "sub-02"]


def test_run_batch_jobs4_threadsafe(tmp_path):
    """--jobs 4 over 8 subjects: no interleaved/corrupt CSV rows, valid QC
    page with a deformation-grid panel per subject (VERDICT items 8+10)."""
    import csv as csvmod

    subjects = tuple(f"sub-{i:02d}" for i in range(1, 9))
    data = _make_bids(tmp_path, subjects=subjects)
    cfgp = str(tmp_path / "cfg.json")
    with open(cfgp, "w") as f:
        json.dump(dict(enc=[4] * 4, dec=[4] * 6, compute_dtype="float32"), f)
    out = str(tmp_path / "out_jobs")
    results, summary = run_batch(
        data, out, _weights(tmp_path), config_path=cfgp, jobs=4,
        fx_contrast="T2w", mov_contrast="T1w",
    )
    assert summary["n_subjects"] == 8
    assert summary["n_ok"] == 8, [r.error for r in results]

    csv_dir = os.path.join(out, "data_processed")
    for fname in ("metrics_on_sc_seg.csv", "nmi.csv", "jacobian_det.csv"):
        with open(os.path.join(csv_dir, fname), newline="") as f:
            rows = list(csvmod.reader(f))
        header, body = rows[0], rows[1:]
        assert len(body) == 8, f"{fname}: expected 8 rows, got {len(body)}"
        ncols = len(header)
        for r in body:
            assert len(r) == ncols, f"{fname}: corrupt row {r}"
        # each subject appears exactly once
        subj_col = [c for c in body]
        ids = sorted(r[1] for r in body)
        assert ids == sorted(subjects)

    html_text = open(os.path.join(out, "qc", "index.html")).read()
    for s in subjects:
        assert s in html_text
    assert html_text.count("moved + deformation grid") == 8
    # 4 panels per subject (fixed, moving, moved, grid)
    assert html_text.count("data:image/png;base64") == 32


def test_warped_grid_mosaic_matches_device_warp():
    """The analytic QC grid mosaic equals mosaicking the device-warped
    gridline volume (closed form A+B-A*B of the separable lattice)."""
    import jax.numpy as jnp

    from multimodal_registration_tpu.ops.warp import warp as device_warp
    from multimodal_registration_tpu.pipeline.qc import (
        _mosaic,
        make_grid_volume,
        warped_grid_mosaic,
    )

    rng = np.random.default_rng(3)
    shape = (32, 24, 16)
    # smooth small field at full res (scale=1 path)
    field = rng.standard_normal((*shape, 3)).astype(np.float32)
    from scipy.ndimage import gaussian_filter

    for c in range(3):
        field[..., c] = gaussian_filter(field[..., c], 3.0) * 8.0

    grid = make_grid_volume(shape)
    warped = np.asarray(device_warp(jnp.asarray(grid), jnp.asarray(field), "linear"))
    legacy = _mosaic(warped)
    analytic = warped_grid_mosaic(field, 1, shape)
    np.testing.assert_allclose(analytic, legacy, atol=1e-4)
