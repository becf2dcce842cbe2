"""Utility tests: step timer, io helpers."""

import json
import os

import numpy as np

from multimodal_registration_tpu.utils import io as vio
from multimodal_registration_tpu.utils import nifti
from multimodal_registration_tpu.utils.profiling import StepTimer


def test_step_timer(tmp_path):
    p = str(tmp_path / "steps.jsonl")
    t = StepTimer(path=p)
    for i in range(3):
        t.start()
        _ = sum(range(1000))
        t.stop(step=i)
    s = t.summary()
    assert s["n"] == 3
    assert s["min"] <= s["p50"] <= s["max"]
    lines = [json.loads(l) for l in open(p)]
    assert len(lines) == 3 and lines[0]["step"] == 0


def test_load_volfile_axes_and_affine(tmp_path):
    data = np.random.default_rng(0).normal(size=(5, 6, 7)).astype(np.float32)
    aff = np.diag([2.0, 1.0, 1.0, 1.0])
    p = str(tmp_path / "v.nii.gz")
    nifti.save(nifti.NiftiImage(data, aff), p)
    v = vio.load_volfile(p, add_batch_axis=True, add_feat_axis=True)
    assert v.shape == (1, 5, 6, 7, 1)
    v2, a = vio.load_volfile(p, ret_affine=True)
    np.testing.assert_allclose(a, aff, atol=1e-5)
    np.testing.assert_allclose(v2, data, atol=1e-6)
    # native and pure-python paths agree
    v3 = vio.load_volfile(p, use_native=False)
    np.testing.assert_allclose(v2, v3, atol=1e-6)


def test_load_labels(tmp_path):
    for i in range(3):
        lab = np.full((4, 4, 4), i, np.uint8)
        nifti.save(nifti.NiftiImage(lab, np.eye(4)), str(tmp_path / f"m{i}.nii.gz"))
    labels, maps = vio.load_labels(str(tmp_path))
    assert len(maps) == 3
    np.testing.assert_array_equal(labels, [0, 1, 2])


def test_load_labels_sees_pending_async_writes(tmp_path):
    """Directory-scan consumers must drain write-behind saves: with async
    writes enabled (as the batch pipeline leaves them mid-run) and the writer
    thread artificially stalled, load_labels must still see every map — the
    original race dropped still-queued files from os.listdir (full-suite
    flake: test_loaded_noncontiguous_labels_are_remapped after test_pipeline)."""
    import threading
    import time as _time

    stall = threading.Event()
    orig = nifti._gz_compress_adaptive

    def slow(payload):
        stall.wait(5.0)  # hold the single writer thread until released
        return orig(payload)

    nifti.enable_async_writes()
    nifti._gz_compress_adaptive = slow
    try:
        for i in range(3):
            lab = np.full((4, 4, 4), i, np.uint8)
            nifti.save(nifti.NiftiImage(lab, np.eye(4)), str(tmp_path / f"m{i}.nii.gz"))
        # release the writer only once load_labels is (correctly) blocking in
        # flush_writes; without the flush, listdir here would see 0-1 files
        threading.Timer(0.2, stall.set).start()
        labels, maps = vio.load_labels(str(tmp_path))
        assert len(maps) == 3
        np.testing.assert_array_equal(labels, [0, 1, 2])
    finally:
        nifti._gz_compress_adaptive = orig
        nifti.disable_async_writes()
