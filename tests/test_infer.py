"""End-to-end inference tests: preprocess, subvolume tiling/blending, the
single-model and cascade CLIs on tiny synthetic NIfTI volumes."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_registration_tpu.infer.blend import blend_subvol_fields, pyramid_weights
from multimodal_registration_tpu.infer.config import InferenceConfig
from multimodal_registration_tpu.infer.preprocess import preprocess, subvol_grid
from multimodal_registration_tpu.infer.register import Registrar, load_params_any, register
from multimodal_registration_tpu.infer.cascade import register_two_steps
from multimodal_registration_tpu.models.vxm_dense import VxmConfig, init_params
from multimodal_registration_tpu.train.trainer import _flatten_params
from multimodal_registration_tpu.utils import nifti

TINY = dict(enc=[4, 4, 4, 4], dec=[4, 4, 4, 4, 4, 4], compute_dtype="float32")


def _make_vol(path, shape=(40, 44, 36), zooms=(1.0, 1.0, 1.0), seed=0):
    rng = np.random.default_rng(seed)
    # smooth blob + noise so registration has structure
    g = np.stack(np.meshgrid(*[np.linspace(-1, 1, s) for s in shape], indexing="ij"))
    blob = np.exp(-((g**2).sum(0)) * 4)
    data = blob + 0.05 * rng.random(shape)
    affine = np.diag([*zooms, 1.0])
    nifti.save(nifti.NiftiImage(data.astype(np.float32), affine), str(path))
    return data


def _tiny_cfg(**over):
    d = dict(TINY)
    d.update(over)
    return InferenceConfig.from_dict(d)


def _save_params_npz(tmp_path, cfg):
    params = init_params(
        VxmConfig(enc=tuple(cfg.enc), dec=tuple(cfg.dec), compute_dtype="float32"),
        inshape=(16, 16, 16),
    )
    p = str(tmp_path / "weights.npz")
    np.savez(p, **_flatten_params(params))
    return p


class TestPreprocess:
    def test_basic_shapes(self, tmp_path):
        fx = tmp_path / "fx.nii.gz"
        mov = tmp_path / "mov.nii.gz"
        _make_vol(fx, (40, 44, 36))
        _make_vol(mov, (38, 42, 30), seed=1)
        cfg = _tiny_cfg()
        pre = preprocess(cfg, nifti.load(str(fx)), nifti.load(str(mov)))
        # floor16 of (40, 44, 36) = (32, 32, 32)
        assert pre.fixed.shape == (32, 32, 32)
        assert pre.moving.shape == (32, 32, 32)
        d = pre.fixed.get_fdata()
        assert 0.0 <= d.min() and d.max() <= 1.0 + 1e-6

    def test_anisotropic_resampled_to_1mm(self, tmp_path):
        fx = tmp_path / "fx.nii.gz"
        mov = tmp_path / "mov.nii.gz"
        _make_vol(fx, (20, 20, 10), zooms=(1.0, 1.0, 2.0))
        _make_vol(mov, (20, 20, 10), zooms=(1.0, 1.0, 2.0), seed=1)
        cfg = _tiny_cfg()
        pre = preprocess(cfg, nifti.load(str(fx)), nifti.load(str(mov)))
        # z resampled from 10 vox @2mm -> 20 vox @1mm; floor16 -> 16
        assert pre.fixed.shape == (16, 16, 16)
        zooms = np.sqrt((np.asarray(pre.fixed.affine)[:3, :3] ** 2).sum(0))
        np.testing.assert_allclose(zooms, 1.0, atol=1e-6)

    def test_ceil16_mode(self, tmp_path):
        fx = tmp_path / "fx.nii.gz"
        mov = tmp_path / "mov.nii.gz"
        _make_vol(fx, (40, 44, 36))
        _make_vol(mov, (40, 44, 36), seed=1)
        cfg = _tiny_cfg(round_mode="ceil16")
        pre = preprocess(cfg, nifti.load(str(fx)), nifti.load(str(mov)))
        assert pre.fixed.shape == (48, 48, 48)

    def test_subvol_tiling_covers(self, tmp_path):
        cfg = _tiny_cfg(use_subvol=True, subvol_size=[16, 16, 16], min_perc_overlap=0.25)
        in_shape, coords = subvol_grid(cfg, (32, 32, 32))
        assert in_shape == (16, 16, 16)
        cover = np.zeros((32, 32, 32), bool)
        for (x0, x1, y0, y1, z0, z1) in coords:
            assert (x1 - x0, y1 - y0, z1 - z0) == in_shape
            cover[x0:x1, y0:y1, z0:z1] = True
        assert cover.all()


class TestBlend:
    def test_pyramid_weights(self):
        w = pyramid_weights((8, 8, 8))
        assert w.shape == (8, 8, 8)
        assert w.max() <= 1.0
        # center heavier than corner
        assert w[4, 4, 4] > w[0, 0, 0]

    def test_constant_fields_blend_to_constant(self):
        coords = [(0, 8, 0, 8, 0, 8), (4, 12, 0, 8, 0, 8)]
        warps = [np.full((8, 8, 8, 3), 2.0, np.float32)] * 2
        out = np.asarray(blend_subvol_fields((8, 8, 8), (12, 8, 8), coords, warps))
        np.testing.assert_allclose(out, 2.0, atol=1e-5)


class TestRegisterE2E:
    def test_pair_registration_whole_vol(self, tmp_path):
        fx = str(tmp_path / "fx.nii.gz")
        mov = str(tmp_path / "mov.nii.gz")
        _make_vol(fx, (40, 40, 36))
        _make_vol(mov, (40, 40, 36), seed=1)
        cfg = _tiny_cfg()
        params = load_params_any(_save_params_npz(tmp_path, cfg), cfg)
        reg = Registrar(cfg, params)
        out = register(cfg, reg, fx, mov, fx_contrast="T2w")
        stem = mov.split(".")[0]
        for suffix in [
            "_proc.nii.gz",
            "_proc_reg_to_T2w.nii.gz",
            "_reg_original_dim.nii.gz",
            "_proc_field_to_T2w.nii.gz",
            "_warp_original_dim.nii.gz",
        ]:
            assert os.path.exists(stem + suffix), suffix
        # warp field contract: (X, Y, Z, 1, 3) with intent 1007
        w = nifti.load(stem + "_proc_field_to_T2w.nii.gz")
        assert w.ndim == 5 and w.shape[3:] == (1, 3)
        assert w.header["intent_code"] == 1007
        # int_res=2 → model warp at half res → scale 2
        assert out["scale"] == 2
        assert out["moved_orig"].shape == (40, 40, 36)

    def test_register_nearest(self, tmp_path):
        fx = str(tmp_path / "fx.nii.gz")
        mov = str(tmp_path / "mov.nii.gz")
        _make_vol(fx, (36, 36, 36))
        _make_vol(mov, (36, 36, 36), seed=1)
        cfg = _tiny_cfg(warp_interpolation="nearest")
        reg = Registrar(cfg, load_params_any(_save_params_npz(tmp_path, cfg), cfg))
        out = register(cfg, reg, fx, mov)
        assert np.isfinite(out["moved"]).all()

    def test_register_subvol(self, tmp_path):
        fx = str(tmp_path / "fx.nii.gz")
        mov = str(tmp_path / "mov.nii.gz")
        _make_vol(fx, (52, 52, 52))
        _make_vol(mov, (52, 52, 52), seed=1)
        cfg = _tiny_cfg(use_subvol=True, subvol_size=[32, 32, 32], min_perc_overlap=0.2)
        reg = Registrar(cfg, load_params_any(_save_params_npz(tmp_path, cfg), cfg))
        out = register(cfg, reg, fx, mov)
        assert out["moved"].shape == (48, 48, 48)
        assert np.isfinite(out["moved"]).all()

    def test_cascade_whole_vol(self, tmp_path):
        fx = str(tmp_path / "fx.nii.gz")
        mov = str(tmp_path / "mov.nii.gz")
        _make_vol(fx, (36, 36, 36))
        _make_vol(mov, (36, 36, 36), seed=1)
        cfg = _tiny_cfg()
        reg1 = Registrar(cfg, load_params_any(_save_params_npz(tmp_path, cfg), cfg))
        reg2 = Registrar(cfg, load_params_any(_save_params_npz(tmp_path, cfg), cfg))
        out = register_two_steps(cfg, reg1, reg2, fx, mov)
        assert np.isfinite(out["moved"]).all()
        assert os.path.exists(mov.split(".")[0] + "_proc_reg_to_T1w.nii.gz")

    def test_identity_params_near_identity_registration(self, tmp_path):
        """With freshly-initialized (≈zero-flow) params, moved ≈ preprocessed
        moving volume."""
        fx = str(tmp_path / "fx.nii.gz")
        mov = str(tmp_path / "mov.nii.gz")
        _make_vol(fx, (36, 36, 36))
        _make_vol(mov, (36, 36, 36), seed=1)
        cfg = _tiny_cfg()
        reg = Registrar(cfg, load_params_any(_save_params_npz(tmp_path, cfg), cfg))
        out = register(cfg, reg, fx, mov)
        pre_mov = nifti.load(mov.split(".")[0] + "_proc.nii.gz").get_fdata()
        np.testing.assert_allclose(out["moved"], pre_mov, atol=1e-2)


class TestGenApplyDefField:
    def test_cli(self, tmp_path, monkeypatch):
        from multimodal_registration_tpu.infer.cli import gen_apply_def_field

        im = str(tmp_path / "im.nii.gz")
        _make_vol(im, (24, 24, 24))
        out = gen_apply_def_field(
            [
                "--im-path", im,
                "--res-dir", str(tmp_path / "res"),
                "--def-scales", "8", "16",
                "--def-max-std", "2",
            ]
        )
        assert os.path.exists(out["def_field"])
        assert os.path.exists(out["moved"])
        f = nifti.load(out["def_field"])
        assert f.shape == (24, 24, 24, 3)


class TestCascadeSubvol:
    def _setup(self, tmp_path, interp):
        fx = str(tmp_path / "fx.nii.gz")
        mov = str(tmp_path / "mov.nii.gz")
        _make_vol(fx, (52, 52, 52))
        _make_vol(mov, (52, 52, 52), seed=1)
        cfg = _tiny_cfg(
            use_subvol=True, subvol_size=[32, 32, 32], min_perc_overlap=0.2,
            warp_interpolation=interp,
        )
        reg1 = Registrar(cfg, load_params_any(_save_params_npz(tmp_path, cfg), cfg))
        reg2 = Registrar(cfg, load_params_any(_save_params_npz(tmp_path, cfg), cfg))
        return cfg, reg1, reg2, fx, mov

    def test_cascade_subvol_linear(self, tmp_path):
        cfg, reg1, reg2, fx, mov = self._setup(tmp_path, "linear")
        out = register_two_steps(cfg, reg1, reg2, fx, mov)
        assert out["moved"].shape == (48, 48, 48)
        assert np.isfinite(out["moved"]).all()
        assert os.path.exists(mov.split(".")[0] + "_proc_field_to_T1w.nii.gz")

    def test_cascade_subvol_nearest_repreprocess(self, tmp_path):
        """The subvol-nearest path re-runs preprocess on the moved result
        (bids_two_steps_registration.py:455) and saves the first-step field."""
        cfg, reg1, reg2, fx, mov = self._setup(tmp_path, "nearest")
        out = register_two_steps(cfg, reg1, reg2, fx, mov)
        assert np.isfinite(out["moved"]).all()
        stem = mov.split(".")[0]
        assert os.path.exists(stem + "_first_proc_field_to_T1w.nii.gz")
        assert os.path.exists(stem + "_proc_first_reg_to_T1w.nii.gz")


def test_export_warp_host_matches_device():
    """The host field export (upsample + RAI permute) must equal the jit."""
    import jax.numpy as jnp

    from multimodal_registration_tpu.infer.register import (
        _export_warp_host,
        _export_warp_jit,
    )

    rng = np.random.default_rng(5)
    w = rng.standard_normal((10, 8, 12, 3)).astype(np.float32)
    perm, inv = [1, 0, 2], [-1, 1, -1]
    for scale in (1, 2):
        out_shape = tuple(s * scale for s in w.shape[:3])
        host = _export_warp_host(w, scale, perm, inv)
        dev = np.asarray(_export_warp_jit(
            jnp.asarray(w), scale, tuple(perm),
            tuple(float(v) for v in inv), out_shape))
        np.testing.assert_allclose(host, dev, rtol=1e-6, atol=1e-6)
