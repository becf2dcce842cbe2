"""Native C++ runtime tests (NIfTI decode + prefetch pool) vs the Python reader."""

import numpy as np
import pytest

from multimodal_registration_tpu.utils import nifti
from multimodal_registration_tpu.utils.native import PrefetchPool, get_lib, load_nifti_native

pytestmark = pytest.mark.skipif(get_lib() is None, reason="native runtime unavailable")


def _save(path, data, affine=None, slope=None, inter=None):
    img = nifti.NiftiImage(data, np.eye(4) if affine is None else affine)
    if slope is not None:
        img.header.scl_slope = slope
    if inter is not None:
        img.header.scl_inter = inter
    nifti.save(img, str(path))


def test_native_matches_python_float32(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.normal(size=(9, 7, 5)).astype(np.float32)
    aff = np.array([[0, 0, 2.0, -5], [1.5, 0, 0, 3], [0, -1, 0, 7], [0, 0, 0, 1.0]])
    p = tmp_path / "x.nii.gz"
    _save(p, data, aff)
    d, a = load_nifti_native(str(p))
    np.testing.assert_allclose(d, data, atol=1e-6)
    np.testing.assert_allclose(a, aff, atol=1e-5)


def test_native_uint8_and_scaling(tmp_path):
    data = np.arange(24, dtype=np.uint8).reshape(2, 3, 4)
    p = tmp_path / "u8.nii.gz"
    _save(p, data, slope=2.0, inter=-1.0)
    d, _ = load_nifti_native(str(p))
    np.testing.assert_allclose(d, data.astype(np.float32) * 2.0 - 1.0)


def test_native_plain_nii(tmp_path):
    data = np.random.default_rng(1).normal(size=(6, 6, 6)).astype(np.float32)
    p = tmp_path / "raw.nii"
    _save(p, data)
    d, _ = load_nifti_native(str(p))
    np.testing.assert_allclose(d, data, atol=1e-6)


def test_prefetch_pool(tmp_path):
    rng = np.random.default_rng(2)
    vols = []
    paths = []
    for i in range(6):
        v = rng.normal(size=(8, 8, 8)).astype(np.float32)
        p = tmp_path / f"v{i}.nii.gz"
        _save(p, v)
        vols.append(v)
        paths.append(str(p))
    pool = PrefetchPool(n_threads=3)
    tickets = [pool.submit(p) for p in paths]
    for t, v in zip(tickets, vols):
        d, _ = pool.wait(t)
        np.testing.assert_allclose(d, v, atol=1e-6)
    pool.close()


def test_native_missing_file_errors(tmp_path):
    with pytest.raises(IOError):
        load_nifti_native(str(tmp_path / "nope.nii.gz"))


def test_native_gz_writer_roundtrip(tmp_path):
    """The C++ gzip writer's output must decode identically via both readers."""
    from multimodal_registration_tpu.utils import nifti
    from multimodal_registration_tpu.utils.native import get_lib, write_gz_native

    if get_lib() is None:
        pytest.skip("native runtime not built")
    data = np.random.default_rng(3).normal(size=(12, 10, 8)).astype(np.float32)
    p = str(tmp_path / "w.nii.gz")
    nifti.save(nifti.NiftiImage(data, np.diag([1.0, 1.0, 2.0, 1.0])), p)
    back = nifti.load(p)
    np.testing.assert_allclose(back.get_fdata(), data, atol=1e-6)
    from multimodal_registration_tpu.utils.native import load_nifti_native

    d2, aff = load_nifti_native(p)
    np.testing.assert_allclose(d2, data, atol=1e-6)
    np.testing.assert_allclose(aff[2, 2], 2.0, atol=1e-6)
    # direct writer API: arbitrary payload roundtrip through gzip
    import gzip
    blob = b"mmreg-native-gz" * 1000
    p2 = str(tmp_path / "blob.gz")
    assert write_gz_native(p2, blob)
    with gzip.open(p2, "rb") as f:
        assert f.read() == blob


def test_native_qform_only_matches_python(tmp_path):
    """sform_code=0 + qform quaternion (FSL/scanner-style): the native
    loader must honour the quaternion like utils/nifti.py, not fall back to
    a pixdim diagonal."""
    import gzip
    import struct

    rng = np.random.default_rng(4)
    data = rng.normal(size=(6, 5, 4)).astype(np.float32)
    p = tmp_path / "q.nii.gz"
    _save(p, data)  # writes sform; we rewrite the codes below
    raw = bytearray(gzip.open(str(p), "rb").read())
    # 30-deg rotation about z: quaternion (a=cos15, b=0, c=0, d=sin15)
    d_q = np.sin(np.deg2rad(15.0))
    struct.pack_into("<h", raw, 252, 1)      # qform_code = 1
    struct.pack_into("<h", raw, 254, 0)      # sform_code = 0
    struct.pack_into("<3f", raw, 256, 0.0, 0.0, float(d_q))
    struct.pack_into("<3f", raw, 268, -5.0, 3.5, 7.25)  # qoffset
    struct.pack_into("<8f", raw, 76, 1.0, 1.0, 1.25, 2.0, 0, 0, 0, 0)
    with gzip.open(str(p), "wb") as f:
        f.write(bytes(raw))

    img = nifti.load(str(p))            # python reference
    dn, an = load_nifti_native(str(p))
    np.testing.assert_allclose(dn, data, atol=1e-6)
    np.testing.assert_allclose(an, img.affine, atol=1e-5)
    assert abs(an[0, 1]) > 0.1, "rotation lost — qform ignored"
