"""int8 quantized-inference path (models/unet.py::ConvBlock._int8_conv,
models/quantize.py).

TPU-native opt-in extension — the reference runs f32 TF-CPU
(`bids_registration.py:303-311`); quantization targets the published
inference architecture's conv-dominated forward (PERF.md round 4b/4f).
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_registration_tpu.models.unet import ConvBlock
from multimodal_registration_tpu.models.vxm_dense import (
    VxmConfig,
    VxmDense,
    init_params,
)
from multimodal_registration_tpu.models.quantize import (
    calibrate_scales,
    load_scales,
    save_scales,
)

CFG = VxmConfig(enc=(32, 32), dec=(32, 32, 32, 32), int_steps=3,
                compute_dtype="float32")
QCFG = dataclasses.replace(CFG, quantize="int8")


def _rand_params(cfg, seed=0, std=0.05):
    params = init_params(cfg, inshape=(32, 32, 32), seed=seed)
    rng = np.random.RandomState(seed)
    return jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.normal(0, std, a.shape), a.dtype)
        if a.ndim > 1 else a,
        params,
    )


def _pair(seed=0, shape=(32, 32, 32)):
    rng = np.random.RandomState(seed)
    return (
        jnp.asarray(rng.rand(1, *shape, 1), jnp.float32),
        jnp.asarray(rng.rand(1, *shape, 1), jnp.float32),
    )


class TestInt8ConvExact:
    def test_grid_exact(self):
        """Inputs/weights already on the int8 grid: the int8 conv block equals
        the f32 conv block bit-for-bit (quantization arithmetic is exact)."""
        rng = np.random.RandomState(0)
        C = 8
        x = jnp.asarray(
            rng.randint(-127, 128, (1, 6, 6, 6, C)), jnp.float32
        )
        k = rng.randint(-126, 127, (3, 3, 3, C, C)).astype(np.float32)
        k[0, 0, 0, 0, :] = 127.0  # per-out-channel absmax exactly 127 -> w_scale 1
        b = rng.normal(0, 1, (C,)).astype(np.float32)
        variables = {"params": {"conv": {"kernel": jnp.asarray(k), "bias": jnp.asarray(b)}}}

        ref = ConvBlock(features=C, dtype=jnp.float32).apply(variables, x)
        got = ConvBlock(
            features=C, dtype=jnp.float32, quant="int8", quant_min_cin=4
        ).apply({**variables, "quant": {"amax": jnp.float32(127.0)}}, x)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    def test_thin_input_stays_full_precision(self):
        """cin < quant_min_cin falls through to the normal conv (no scale needed)."""
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.rand(1, 6, 6, 6, 2), jnp.float32)
        k = jnp.asarray(rng.normal(0, 0.1, (3, 3, 3, 2, 8)), jnp.float32)
        b = jnp.zeros((8,), jnp.float32)
        variables = {"params": {"conv": {"kernel": k, "bias": b}}}
        ref = ConvBlock(features=8, dtype=jnp.float32).apply(variables, x)
        got = ConvBlock(features=8, dtype=jnp.float32, quant="int8").apply(
            variables, x
        )  # no "quant" collection: must not be required for thin convs
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    def test_missing_scales_raise(self):
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.rand(1, 6, 6, 6, 64), jnp.float32)
        k = jnp.asarray(rng.normal(0, 0.1, (3, 3, 3, 64, 8)), jnp.float32)
        variables = {"params": {"conv": {"kernel": k, "bias": jnp.zeros((8,))}}}
        with pytest.raises(ValueError, match="calibrated activation scales"):
            ConvBlock(features=8, dtype=jnp.float32, quant="int8").apply(
                variables, x
            )

    def test_conv2d_decomp_bit_exact(self, monkeypatch):
        """MMREG_CONV2D_DECOMP routes the int8 conv through three z-tap
        Conv2Ds (int32 partials — integer adds commute, so the int32 conv
        output is IDENTICAL and the f32 epilogue sees the same values)."""
        rng = np.random.RandomState(4)
        C = 64
        x = jnp.asarray(rng.rand(1, 7, 8, 9, C), jnp.float32)
        k = jnp.asarray(rng.normal(0, 0.05, (3, 3, 3, C, 8)), jnp.float32)
        variables = {
            "params": {"conv": {"kernel": k, "bias": jnp.zeros((8,))}},
            "quant": {"amax": jnp.float32(1.0)},
        }
        block = ConvBlock(features=8, dtype=jnp.float32, quant="int8")
        monkeypatch.setenv("MMREG_CONV2D_DECOMP", "0")
        ref = np.asarray(block.apply(variables, x))
        monkeypatch.setenv("MMREG_CONV2D_DECOMP", "1")
        got = np.asarray(block.apply(variables, x))
        np.testing.assert_array_equal(ref, got)

    def test_tolerance_random_block(self):
        """Random small-weight conv: int8 output tracks f32 within the expected
        per-tensor quantization noise (~1% of the output range)."""
        rng = np.random.RandomState(3)
        C = 64
        x = jnp.asarray(rng.rand(1, 8, 8, 8, C), jnp.float32)
        k = jnp.asarray(rng.normal(0, 0.05, (3, 3, 3, C, C)), jnp.float32)
        b = jnp.asarray(rng.normal(0, 0.1, (C,)), jnp.float32)
        variables = {"params": {"conv": {"kernel": k, "bias": b}}}
        ref = np.asarray(ConvBlock(features=C, dtype=jnp.float32).apply(variables, x))
        got = np.asarray(
            ConvBlock(features=C, dtype=jnp.float32, quant="int8").apply(
                {**variables, "quant": {"amax": jnp.float32(1.25)}}, x
            )
        )
        rel = np.max(np.abs(ref - got)) / np.max(np.abs(ref))
        assert rel < 0.02, rel


class TestCalibration:
    def test_scale_structure_and_running_max(self):
        params = _rand_params(QCFG)
        p1, p2 = _pair(0), _pair(7)
        q_one = calibrate_scales(QCFG, params, [p1], margin=1.0)
        q_two = calibrate_scales(QCFG, params, [p1, p2], margin=1.0)
        flat1 = jax.tree_util.tree_leaves(q_one)
        flat2 = jax.tree_util.tree_leaves(q_two)
        # every 32-channel conv input gets a scale: enc_1 (cin 32 after
        # quant_min_cin... enc/dec widths here are 32 < 64) — widths below the
        # default threshold record nothing
        assert len(flat1) == len(flat2)
        # running max over more pairs can only grow
        for a, b in zip(flat1, flat2):
            assert float(b) >= float(a)

    def test_default_threshold_skips_thin_nets(self):
        """A 16-wide net (32-ch concat max) has no quantizable conv under the
        default cin>=64 threshold — calibration returns an empty collection
        and the quantized apply equals full precision."""
        thin_q = dataclasses.replace(
            QCFG, enc=(16, 16), dec=(16, 16, 16, 16)
        )
        thin_f = dataclasses.replace(thin_q, quantize="")
        params = _rand_params(thin_q)
        mov, fx = _pair(0)
        quant = calibrate_scales(thin_q, params, [(mov, fx)])
        assert not jax.tree_util.tree_leaves(quant)
        out_q = VxmDense(cfg=thin_q).apply({**params, "quant": quant}, mov, fx)
        out_f = VxmDense(cfg=thin_f).apply(params, mov, fx)
        np.testing.assert_allclose(
            np.asarray(out_q["svf"]), np.asarray(out_f["svf"]), atol=1e-6
        )

    def test_wide_net_quantizes_and_tracks(self):
        cfg = dataclasses.replace(
            CFG, enc=(64, 64), dec=(64, 64, 64, 64), quantize="int8"
        )
        params = _rand_params(cfg, std=0.03)
        mov, fx = _pair(1)
        quant = calibrate_scales(cfg, params, [(mov, fx)])
        names = {"/".join(k) for k in
                 __import__("flax").traverse_util.flatten_dict(quant)}
        # enc_0 (cin 2) skipped; wide convs + the 128-ch concat dec convs present
        assert "unet/enc_1/amax" in names and "unet/dec_0/amax" in names
        assert "unet/enc_0/amax" not in names
        out_q = VxmDense(cfg=cfg).apply({**params, "quant": quant}, mov, fx)
        out_f = VxmDense(cfg=dataclasses.replace(cfg, quantize="")).apply(
            params, mov, fx
        )
        svf_f, svf_q = np.asarray(out_f["svf"]), np.asarray(out_q["svf"])
        rel = np.max(np.abs(svf_f - svf_q)) / max(np.max(np.abs(svf_f)), 1e-9)
        assert rel < 0.15, rel

    def test_sidecar_roundtrip(self, tmp_path):
        cfg = dataclasses.replace(
            CFG, enc=(64, 64), dec=(64, 64, 64, 64), quantize="int8"
        )
        params = _rand_params(cfg)
        mov, fx = _pair(2)
        quant = calibrate_scales(cfg, params, [(mov, fx)])
        path = str(tmp_path / "scales.quant.json")
        save_scales(path, quant)
        q2 = load_scales(path)
        a = VxmDense(cfg=cfg).apply({**params, "quant": quant}, mov, fx)
        b = VxmDense(cfg=cfg).apply({**params, "quant": q2}, mov, fx)
        np.testing.assert_array_equal(np.asarray(a["svf"]), np.asarray(b["svf"]))


class TestRegistrarQuantized:
    def test_lazy_calibration_and_consistency(self):
        from multimodal_registration_tpu.infer.config import InferenceConfig
        from multimodal_registration_tpu.infer.register import Registrar

        base = dict(
            enc=[64, 64], dec=[64, 64, 64, 64], int_steps=3,
            compute_dtype="float32",
        )
        cfg_f = InferenceConfig.from_dict(dict(base))
        cfg_q = InferenceConfig.from_dict(dict(base, quantize="int8"))
        vxm = VxmConfig(enc=(64, 64), dec=(64, 64, 64, 64), int_steps=3,
                        compute_dtype="float32")
        params = _rand_params(vxm, std=0.02)
        rng = np.random.RandomState(5)
        mov = rng.rand(1, 32, 32, 32).astype(np.float32)
        fx = rng.rand(1, 32, 32, 32).astype(np.float32)

        reg_q = Registrar(cfg_q, params)
        assert reg_q.quant_scales is None
        moved_q, warp_q = reg_q.predict(mov, fx)
        assert reg_q.quant_scales is not None  # calibrated once
        scales_after_first = reg_q.quant_scales
        moved_q2, warp_q2 = reg_q.predict(mov, fx)
        assert reg_q.quant_scales is scales_after_first  # cached
        np.testing.assert_array_equal(warp_q, warp_q2)  # deterministic

        _, warp_f = Registrar(cfg_f, params).predict(mov, fx)
        rel = np.max(np.abs(warp_f - warp_q)) / max(np.max(np.abs(warp_f)), 1e-9)
        assert rel < 0.15, rel

    def test_sharded_matches_single_device(self):
        """quantize + space sharding: int32 conv accumulation is exact, so the
        sharded quantized forward must equal the single-device one (the same
        equality contract the bf16 sharded path carries, test_parallel.py)."""
        from multimodal_registration_tpu.infer.config import InferenceConfig
        from multimodal_registration_tpu.infer.register import Registrar
        from multimodal_registration_tpu.infer.sharded import ShardedRegistrar
        from multimodal_registration_tpu.parallel.mesh import make_mesh

        cfg = InferenceConfig.from_dict(dict(
            enc=[64, 64], dec=[64, 64, 64, 64], int_steps=3,
            compute_dtype="float32", quantize="int8",
        ))
        vxm = VxmConfig(enc=(64, 64), dec=(64, 64, 64, 64), int_steps=3,
                        compute_dtype="float32")
        params = _rand_params(vxm, std=0.02)
        rng = np.random.RandomState(11)
        mov = rng.rand(1, 64, 32, 32).astype(np.float32)
        fx = rng.rand(1, 64, 32, 32).astype(np.float32)

        sharded = ShardedRegistrar(cfg, params, make_mesh(8, space=2))
        m1, w1 = sharded.predict(mov, fx)
        m2, w2 = Registrar(cfg, params).predict(mov, fx)
        np.testing.assert_allclose(w1, w2, atol=2e-5)
        np.testing.assert_allclose(m1, m2, atol=2e-5)

    def test_sidecar_autoload(self, tmp_path):
        """<model>.quant.json next to the checkpoint is auto-loaded by the CLI
        funnel (maybe_load_sidecar) and skips lazy calibration."""
        from multimodal_registration_tpu.models.quantize import (
            maybe_load_sidecar,
            sidecar_path,
        )
        from multimodal_registration_tpu.infer.config import InferenceConfig
        from multimodal_registration_tpu.infer.register import Registrar

        cfg = InferenceConfig.from_dict(dict(
            enc=[64, 64], dec=[64, 64, 64, 64], int_steps=3,
            compute_dtype="float32", quantize="int8",
        ))
        vxm = VxmConfig(enc=(64, 64), dec=(64, 64, 64, 64), int_steps=3,
                        compute_dtype="float32", quantize="int8")
        params = _rand_params(vxm, std=0.02)
        mov, fx = _pair(9)
        quant = calibrate_scales(vxm, params, [(mov, fx)])
        model_path = str(tmp_path / "w.npz")
        save_scales(sidecar_path(model_path), quant)

        assert maybe_load_sidecar(model_path, cfg) is not None
        # config without quantize ignores the sidecar
        cfg_off = InferenceConfig.from_dict(dict(
            enc=[64, 64], dec=[64, 64, 64, 64], int_steps=3,
            compute_dtype="float32",
        ))
        assert maybe_load_sidecar(model_path, cfg_off) is None

        reg = Registrar(cfg, params,
                        quant_scales=maybe_load_sidecar(model_path, cfg))
        m = np.asarray(mov[..., 0])
        f = np.asarray(fx[..., 0])
        _, w_side = reg.predict(m, f)
        assert reg.quant_scales is not None
        _, w_lazy = Registrar(cfg, params).predict(m, f)
        # sidecar scales came from the same pair the lazy path calibrates on
        np.testing.assert_allclose(w_side, w_lazy, atol=1e-6)

    def test_lazy_calibration_persists_sidecar(self, tmp_path):
        """Round-5 productization (VERDICT r4 missing #4): a registrar given a
        ``quant_sidecar`` path writes its lazily-calibrated scales there, and
        a second registrar built through ``sidecar_kwargs`` loads them and
        never calls calibrate_scales again."""
        from multimodal_registration_tpu.infer.config import InferenceConfig
        from multimodal_registration_tpu.infer.register import Registrar
        from multimodal_registration_tpu.models import quantize as qmod

        cfg = InferenceConfig.from_dict(dict(
            enc=[64, 64], dec=[64, 64, 64, 64], int_steps=3,
            compute_dtype="float32", quantize="int8",
        ))
        vxm = VxmConfig(enc=(64, 64), dec=(64, 64, 64, 64), int_steps=3,
                        compute_dtype="float32")
        params = _rand_params(vxm, std=0.02)
        rng = np.random.RandomState(21)
        mov = rng.rand(1, 32, 32, 32).astype(np.float32)
        fx = rng.rand(1, 32, 32, 32).astype(np.float32)

        model_path = str(tmp_path / "w.npz")
        kw = qmod.sidecar_kwargs(model_path, cfg)
        assert kw["quant_scales"] is None  # nothing on disk yet
        reg = Registrar(cfg, params, **kw)
        _, w1 = reg.predict(mov, fx)
        side = qmod.sidecar_path(model_path)
        assert os.path.exists(side), "lazy calibration must persist the sidecar"

        # second construction: scales come from disk; calibration must not run
        kw2 = qmod.sidecar_kwargs(model_path, cfg)
        assert kw2["quant_scales"] is not None

        def _boom(*a, **k):  # pragma: no cover - fails the test if reached
            raise AssertionError("calibrate_scales called despite sidecar")

        orig = qmod.calibrate_scales
        qmod.calibrate_scales = _boom
        try:
            _, w2 = Registrar(cfg, params, **kw2).predict(mov, fx)
        finally:
            qmod.calibrate_scales = orig
        np.testing.assert_array_equal(w1, w2)

    def test_sidecar_kwargs_off_when_not_quantized(self, tmp_path):
        from multimodal_registration_tpu.infer.config import InferenceConfig
        from multimodal_registration_tpu.models.quantize import sidecar_kwargs

        cfg = InferenceConfig.from_dict(dict(enc=[32, 32], dec=[32, 32, 32, 32]))
        assert sidecar_kwargs(str(tmp_path / "w.npz"), cfg) == {}

    def test_quant_calibrate_cli_writes_sidecar(self, tmp_path):
        """The mmreg-calibrate entry point: preprocess real NIfTI pairs, write
        the sidecar, and the pair-registration CLI then runs quantized without
        recalibrating."""
        from multimodal_registration_tpu.infer.cli import (
            pair_registration,
            quant_calibrate,
        )
        from multimodal_registration_tpu.models import quantize as qmod
        from multimodal_registration_tpu.models.vxm_dense import init_params
        from multimodal_registration_tpu.train.trainer import _flatten_params
        from multimodal_registration_tpu.utils import nifti

        rng = np.random.RandomState(3)
        shape = (40, 44, 36)
        for name, seed in (("fx", 0), ("mov", 1)):
            g = np.stack(np.meshgrid(
                *[np.linspace(-1, 1, s) for s in shape], indexing="ij"))
            data = np.exp(-(g ** 2).sum(0) * 4) + 0.05 * rng.rand(*shape)
            nifti.save(
                nifti.NiftiImage(data.astype(np.float32), np.eye(4)),
                str(tmp_path / f"{name}.nii.gz"),
            )
        vxm = VxmConfig(enc=(64, 64), dec=(64, 64, 64, 64), int_steps=3,
                        compute_dtype="float32")
        model_path = str(tmp_path / "w.npz")
        np.savez(model_path, **_flatten_params(
            init_params(vxm, inshape=(16, 16, 16))))
        cfg_path = str(tmp_path / "cfg.json")
        import json

        with open(cfg_path, "w") as f:
            json.dump(dict(enc=[64, 64], dec=[64, 64, 64, 64], int_steps=3,
                           compute_dtype="float32", quantize="int8"), f)

        out = quant_calibrate([
            "--model-path", model_path, "--config-path", cfg_path,
            "--pair", f"{tmp_path}/fx.nii.gz,{tmp_path}/mov.nii.gz",
            "--one-cpu-tf", "False",
        ])
        assert out == qmod.sidecar_path(model_path) and os.path.exists(out)

        orig = qmod.calibrate_scales

        def _boom(*a, **k):  # pragma: no cover
            raise AssertionError("CLI recalibrated despite sidecar")

        qmod.calibrate_scales = _boom
        try:
            res = pair_registration([
                "--model-path", model_path, "--config-path", cfg_path,
                "--fx-img-path", f"{tmp_path}/fx.nii.gz",
                "--mov-img-path", f"{tmp_path}/mov.nii.gz",
                "--res-dir", str(tmp_path / "res"),
                "--one-cpu-tf", "False",
            ])
        finally:
            qmod.calibrate_scales = orig
        assert os.path.exists(res["paths"]["moved_orig"])

    def test_quant_calibrate_cli_thin_net_errors(self, tmp_path):
        """Nothing quantizable at thin widths -> a one-line actionable error,
        not an empty sidecar."""
        from multimodal_registration_tpu.infer.cli import quant_calibrate
        from multimodal_registration_tpu.models.vxm_dense import init_params
        from multimodal_registration_tpu.train.trainer import _flatten_params
        from multimodal_registration_tpu.utils import nifti

        shape = (40, 44, 36)
        for name in ("fx", "mov"):
            nifti.save(
                nifti.NiftiImage(np.zeros(shape, np.float32), np.eye(4)),
                str(tmp_path / f"{name}.nii.gz"),
            )
        vxm = VxmConfig(enc=(16, 16), dec=(16, 16, 16, 16), int_steps=3,
                        compute_dtype="float32")
        model_path = str(tmp_path / "w.npz")
        np.savez(model_path, **_flatten_params(
            init_params(vxm, inshape=(16, 16, 16))))
        import json

        cfg_path = str(tmp_path / "cfg.json")
        with open(cfg_path, "w") as f:
            json.dump(dict(enc=[16, 16], dec=[16, 16, 16, 16], int_steps=3,
                           compute_dtype="float32"), f)
        with pytest.raises(SystemExit, match="nothing to calibrate"):
            quant_calibrate([
                "--model-path", model_path, "--config-path", cfg_path,
                "--pair", f"{tmp_path}/fx.nii.gz,{tmp_path}/mov.nii.gz",
                "--one-cpu-tf", "False",
            ])

    def test_unknown_quantize_key_rejected_elsewhere(self):
        from multimodal_registration_tpu.infer.config import InferenceConfig

        cfg = InferenceConfig.from_dict({"quantize": None})
        assert cfg.quantize == ""  # null accepted and normalized to off...
        from multimodal_registration_tpu.infer.register import Registrar

        params = _rand_params(
            VxmConfig(enc=(32, 32), dec=(32, 32, 32, 32), compute_dtype="float32")
        )
        # ...and treated as off by the Registrar
        cfg.enc, cfg.dec, cfg.int_steps = [32, 32], [32, 32, 32, 32], 3
        cfg.compute_dtype = "float32"
        assert Registrar(cfg, params).vxm_cfg.quantize == ""
