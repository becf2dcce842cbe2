"""Error-path robustness (VERDICT r4 directive 7): failing inputs must produce
one-line actionable errors, not raw shape crashes or decoder tracebacks.

Operability target: the reference fails with raw tracebacks on the same
inputs (`3d_reg.py:421` NameError class of bug; nibabel internals on corrupt
files; Keras shape errors on mismatched checkpoints).
"""

import gzip
import json
import os

import numpy as np
import pytest

from multimodal_registration_tpu.infer.config import InferenceConfig
from multimodal_registration_tpu.infer.register import load_params_any
from multimodal_registration_tpu.models.vxm_dense import VxmConfig, init_params
from multimodal_registration_tpu.train.trainer import _flatten_params
from multimodal_registration_tpu.utils import nifti

TINY = dict(enc=[4, 4, 4, 4], dec=[4, 4, 4, 4, 4, 4], compute_dtype="float32")


def _save_npz(tmp_path, enc, dec, name="w.npz"):
    params = init_params(
        VxmConfig(enc=tuple(enc), dec=tuple(dec), compute_dtype="float32"),
        inshape=(16, 16, 16),
    )
    p = str(tmp_path / name)
    np.savez(p, **_flatten_params(params))
    return p


class TestCheckpointMismatch:
    def test_npz_width_mismatch_is_actionable(self, tmp_path):
        """A checkpoint trained at other widths names the architecture problem
        and the fix, instead of a bare KeyError/shape crash."""
        p = _save_npz(tmp_path, (8,) * 4, (8,) * 6)
        cfg = InferenceConfig.from_dict(dict(TINY))
        with pytest.raises(ValueError, match="does not match the config's architecture"):
            load_params_any(p, cfg)

    def test_npz_matching_widths_loads(self, tmp_path):
        p = _save_npz(tmp_path, (4,) * 4, (4,) * 6)
        cfg = InferenceConfig.from_dict(dict(TINY))
        assert load_params_any(p, cfg) is not None

    def test_h5_width_mismatch_is_actionable(self, tmp_path):
        h5py = pytest.importorskip("h5py")
        # a syntactically-valid h5 whose groups don't cover the model
        p = str(tmp_path / "w.h5")
        with h5py.File(p, "w") as f:
            g = f.create_group("model_weights")
            g.attrs["layer_names"] = [b"nothing"]
        cfg = InferenceConfig.from_dict(dict(TINY))
        with pytest.raises(ValueError, match="does not match the config's architecture"):
            load_params_any(p, cfg)


class TestCorruptNifti:
    def _valid_file(self, tmp_path, name="ok.nii.gz"):
        p = str(tmp_path / name)
        nifti.save(
            nifti.NiftiImage(np.zeros((8, 8, 8), np.float32), np.eye(4)), p
        )
        nifti.flush_writes()
        return p

    def test_truncated_gz_python_decoder(self, tmp_path):
        p = self._valid_file(tmp_path)
        raw = open(p, "rb").read()
        trunc = str(tmp_path / "trunc.nii.gz")
        with open(trunc, "wb") as f:
            f.write(raw[: len(raw) // 2])
        with pytest.raises(ValueError, match="corrupt or truncated NIfTI"):
            nifti.load(trunc)

    def test_truncated_payload_inside_valid_gzip(self, tmp_path):
        """gzip layer intact, NIfTI payload cut short -> still one clear error."""
        p = self._valid_file(tmp_path)
        with gzip.open(p, "rb") as f:
            payload = f.read()
        bad = str(tmp_path / "short.nii.gz")
        with gzip.open(bad, "wb") as f:
            f.write(payload[: len(payload) - 100])
        with pytest.raises(ValueError, match="corrupt or truncated NIfTI"):
            nifti.load(bad)

    def test_garbage_bytes(self, tmp_path):
        bad = str(tmp_path / "garbage.nii.gz")
        with open(bad, "wb") as f:
            f.write(b"this is not a nifti file, not even a gzip one")
        with pytest.raises(ValueError, match="corrupt or truncated NIfTI"):
            nifti.load(bad)

    def test_missing_file_stays_file_not_found(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            nifti.load(str(tmp_path / "nope.nii.gz"))

    def test_native_decoder_corrupt_file(self, tmp_path):
        from multimodal_registration_tpu.utils import native

        if native.get_lib() is None:
            pytest.skip("native runtime unavailable")
        bad = str(tmp_path / "garbage.nii.gz")
        with open(bad, "wb") as f:
            f.write(b"\x1f\x8b not really gzip payload here")
        with pytest.raises(IOError, match="native nifti"):
            native.load_nifti_native(bad)


class TestConfigValidation:
    def test_invalid_quantize_value(self):
        with pytest.raises(ValueError, match="unknown quantize mode"):
            InferenceConfig.from_dict({"quantize": "int4"})

    def test_quantize_null_normalized_off(self):
        assert InferenceConfig.from_dict({"quantize": None}).quantize == ""

    def test_sharding_zero_rejected(self):
        with pytest.raises(ValueError, match="sharding.space must be a positive"):
            InferenceConfig.from_dict({"sharding": {"space": 0}})

    def test_sharding_string_rejected(self):
        with pytest.raises(ValueError, match="sharding.data must be a positive"):
            InferenceConfig.from_dict({"sharding": {"data": "2"}})

    def test_sharding_bool_rejected(self):
        with pytest.raises(ValueError, match="positive integer"):
            InferenceConfig.from_dict({"sharding": {"space": True}})

    def test_sharding_valid_passes(self):
        cfg = InferenceConfig.from_dict({"sharding": {"data": 2, "space": 4}})
        assert cfg.sharding == {"data": 2, "space": 4}


class TestSubvolTooLarge:
    def _pair_on_disk(self, tmp_path, shape=(40, 44, 36)):
        rng = np.random.default_rng(0)
        for name, seed in (("fx", 0), ("mov", 1)):
            nifti.save(
                nifti.NiftiImage(
                    rng.random(shape).astype(np.float32), np.eye(4)),
                str(tmp_path / f"{name}.nii.gz"),
            )
        nifti.flush_writes()
        return str(tmp_path / "fx.nii.gz"), str(tmp_path / "mov.nii.gz")

    def test_cascade_subvol_too_large(self, tmp_path, monkeypatch):
        """The subvol-size guard (infer/preprocess.py) must also protect the
        two-step cascade entry (VERDICT r4 directive 7)."""
        from multimodal_registration_tpu.infer.cascade import register_two_steps
        from multimodal_registration_tpu.infer.register import Registrar

        fx, mov = self._pair_on_disk(tmp_path)
        cfg = InferenceConfig.from_dict(dict(
            TINY, use_subvol=True, subvol_size=[64, 64, 64]))
        params = init_params(
            VxmConfig(enc=(4,) * 4, dec=(4,) * 6, compute_dtype="float32"),
            inshape=(16, 16, 16),
        )
        reg1 = Registrar(cfg, params)
        reg2 = Registrar(cfg, params)
        monkeypatch.chdir(tmp_path)
        with pytest.raises(ValueError, match="exceeds the preprocessed volume"):
            register_two_steps(cfg, reg1, reg2, fx, mov)
