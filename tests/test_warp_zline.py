"""Z-line row-reduction warp: exact equivalence with the reference-semantics
gather8 warp on the fast path, and correct fallback when guards fail."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import importlib

warp_mod = importlib.import_module("multimodal_registration_tpu.ops.warp")
from multimodal_registration_tpu.ops import warp_zline as wz


def _ref(vol, flow):
    """gather8 flat formulation — reference semantics baseline."""
    import os
    old = os.environ.get("MMREG_WARP_MODE")
    os.environ["MMREG_WARP_MODE"] = "gather8"
    try:
        return np.asarray(warp_mod.warp(vol, flow, interp="linear"))
    finally:
        if old is None:
            del os.environ["MMREG_WARP_MODE"]
        else:
            os.environ["MMREG_WARP_MODE"] = old


def _smooth_flow(shape, scale, seed, mag):
    """Smooth random flow: upsampled coarse noise (guards should hold)."""
    rng = np.random.RandomState(seed)
    coarse = rng.randn(*[max(2, s // scale) for s in shape], 3) * mag
    out = np.zeros((*shape, 3), np.float32)
    for c in range(3):
        from scipy.ndimage import zoom

        factors = [s / cs for s, cs in zip(shape, coarse.shape[:3])]
        out[..., c] = zoom(coarse[..., c], factors, order=1)[
            tuple(slice(0, s) for s in shape)]
    return out


class TestZlineWarp:
    def test_fast_path_engages_and_matches(self):
        shape = (16, 16, 32)
        flow = jnp.asarray(_smooth_flow(shape, 16, 0, 0.3))
        vol = jnp.asarray(np.random.RandomState(1).rand(*shape, 2).astype(np.float32))
        plan = wz.zline_plan(shape[2], 2, 4)
        assert plan is not None
        g, zb = plan
        grid = wz.identity_grid(shape, dtype=jnp.float32)
        c = jnp.clip(grid + flow, 0.0, jnp.asarray([d - 1 for d in shape], jnp.float32))
        assert bool(wz._guards_ok(c, g, zb, *shape)), "fast-path guard should hold"
        got = np.asarray(wz.warp_zline(vol, flow))
        np.testing.assert_allclose(got, _ref(vol, flow), atol=1e-5)

    def test_body_matches_exactly_on_larger_flows(self):
        # moderately large but smooth flows (several voxels) stay on the fast
        # path and must still be exact
        shape = (8, 8, 32)
        flow = jnp.asarray(3.0 + _smooth_flow(shape, 32, 2, 0.3))
        vol = jnp.asarray(np.random.RandomState(3).rand(*shape).astype(np.float32))
        got = np.asarray(wz.warp_zline(vol, flow))
        np.testing.assert_allclose(got, _ref(vol, flow), atol=1e-5)

    def test_edge_clamping(self):
        # constant flow pushing everything past the edges: floor-constant, so
        # the fast path engages; clamped corners must match the reference
        shape = (8, 8, 16)
        vol = jnp.asarray(np.random.RandomState(4).rand(*shape).astype(np.float32))
        for vec in ((5.3, -4.2, 9.7), (-20.0, 0.4, -0.6)):
            flow = jnp.broadcast_to(jnp.asarray(vec, jnp.float32), (*shape, 3))
            got = np.asarray(wz.warp_zline(vol, flow))
            np.testing.assert_allclose(got, _ref(vol, flow), atol=1e-5,
                                       err_msg=f"vec={vec}")

    def test_rough_flow_falls_back(self):
        # high-frequency flow violates the per-line floor guards -> cond
        # must take the exact fallback
        shape = (8, 8, 16)
        rng = np.random.RandomState(5)
        flow = jnp.asarray((rng.rand(*shape, 3) - 0.5).astype(np.float32) * 8)
        vol = jnp.asarray(rng.rand(*shape).astype(np.float32))
        plan = wz.zline_plan(shape[2], 1, 4)
        g, zb = plan
        grid = wz.identity_grid(shape, dtype=jnp.float32)
        c = jnp.clip(grid + flow, 0.0, jnp.asarray([d - 1 for d in shape], jnp.float32))
        assert not bool(wz._guards_ok(c, g, zb, *shape))
        got = np.asarray(wz.warp_zline(vol, flow))
        np.testing.assert_allclose(got, _ref(vol, flow), atol=1e-5)

    def test_small_z_returns_fallback(self):
        shape = (6, 6, 10)  # z not blockable -> plan None -> fallback
        assert wz.zline_plan(10, 1, 4) is None
        rng = np.random.RandomState(6)
        vol = jnp.asarray(rng.rand(*shape).astype(np.float32))
        flow = jnp.asarray((rng.rand(*shape, 3) - 0.5).astype(np.float32) * 2)
        got = np.asarray(wz.warp_zline(vol, flow))
        np.testing.assert_allclose(got, _ref(vol, flow), atol=1e-5)

    def test_env_disable(self, monkeypatch):
        monkeypatch.setenv("MMREG_ZLINE_WARP", "0")
        assert wz.zline_plan(64, 1, 4) is None

    def test_bf16_payload_tolerance(self):
        shape = (8, 8, 32)
        flow = jnp.asarray(_smooth_flow(shape, 8, 7, 1.0))
        vol = jnp.asarray(np.random.RandomState(8).rand(*shape).astype(np.float32))
        got = np.asarray(wz.warp_zline(vol, flow, payload_dtype=jnp.bfloat16))
        np.testing.assert_allclose(got, _ref(vol, flow), atol=5e-3)

    def test_batched_matches_per_element(self):
        shape = (8, 8, 32)
        flows = jnp.stack([
            jnp.asarray(_smooth_flow(shape, 16, s, 0.4)) for s in (11, 12)])
        vols = jnp.asarray(np.random.RandomState(13).rand(2, *shape, 2)
                           .astype(np.float32))
        got = np.asarray(wz.warp_zline_batch(vols, flows))
        for i in range(2):
            np.testing.assert_allclose(got[i], _ref(vols[i], flows[i]),
                                       atol=1e-5)

    def test_integrate_zline_matches_reference_integration(self):
        from multimodal_registration_tpu.ops.integrate import integrate_svf

        shape = (8, 8, 32)
        vel = jnp.stack([
            jnp.asarray(_smooth_flow(shape, 16, s, 1.5)) for s in (14, 15)])
        got = np.asarray(wz.integrate_svf_zline_batch(vel, 5))
        ref = np.stack([np.asarray(integrate_svf(vel[i], 5)) for i in range(2)])
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_model_env_flag_equivalence(self, monkeypatch):
        """MMREG_ZLINE_MODEL=1 forward must match the default forward."""
        from multimodal_registration_tpu.models.vxm_dense import (
            VxmConfig, VxmDense, init_params)

        cfg = VxmConfig(enc=(4,) * 4, dec=(4,) * 6, int_steps=3, int_res=2,
                        svf_res=2, compute_dtype="float32",
                        integrate_payload_dtype="")
        model = VxmDense(cfg=cfg)
        params = init_params(cfg, inshape=(16, 16, 16), seed=1)
        rng = np.random.RandomState(16)
        mov = jnp.asarray(rng.rand(1, 16, 16, 32, 1).astype(np.float32))
        fx = jnp.asarray(rng.rand(1, 16, 16, 32, 1).astype(np.float32))
        monkeypatch.setenv("MMREG_ZLINE_MODEL", "0")
        base = model.apply(params, mov, fx)
        monkeypatch.setenv("MMREG_ZLINE_MODEL", "1")
        zl = model.apply(params, mov, fx)
        np.testing.assert_allclose(np.asarray(zl["moved"]),
                                   np.asarray(base["moved"]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(zl["flow_fullres"]),
                                   np.asarray(base["flow_fullres"]), atol=1e-5)

    def test_grad_flows_through_fast_path(self):
        shape = (8, 8, 16)
        vol = jnp.asarray(np.random.RandomState(9).rand(*shape).astype(np.float32))
        flow = jnp.asarray(_smooth_flow(shape, 8, 10, 0.5))

        def loss_z(f):
            return jnp.sum(wz.warp_zline(vol, f) ** 2)

        def loss_ref(f):
            import os
            os.environ["MMREG_WARP_MODE"] = "gather8"
            try:
                return jnp.sum(warp_mod.warp(vol, f, interp="linear") ** 2)
            finally:
                del os.environ["MMREG_WARP_MODE"]

        gz = np.asarray(jax.grad(loss_z)(flow))
        gr = np.asarray(jax.grad(loss_ref)(flow))
        np.testing.assert_allclose(gz, gr, atol=1e-4)


class TestZlineCompose:
    def test_compose_matches_exact(self):
        """Smooth phi2 (model-flow analogue) + rough phi1 (generator-field
        analogue): coordinates come from phi2, so the fast path holds and
        must match the exact compose."""
        from multimodal_registration_tpu.ops.field import compose_fields_batch

        shape = (8, 8, 16)
        rng = np.random.RandomState(3)
        phi1 = jnp.asarray(rng.randn(2, *shape, 3).astype(np.float32) * 4.0)
        phi2 = jnp.asarray(np.stack([
            _smooth_flow(shape, 8, 20 + i, 0.6) for i in range(2)]))
        exact = np.asarray(compose_fields_batch(phi1, phi2))
        fast = np.asarray(wz.compose_fields_zline_batch(phi1, phi2))
        np.testing.assert_allclose(fast, exact, atol=1e-5)

    def test_compose_rough_phi2_falls_back(self):
        from multimodal_registration_tpu.ops.field import compose_fields_batch

        shape = (8, 8, 16)
        rng = np.random.RandomState(4)
        phi1 = jnp.asarray(rng.randn(1, *shape, 3).astype(np.float32))
        phi2 = jnp.asarray(rng.randn(1, *shape, 3).astype(np.float32) * 9.0)
        exact = np.asarray(compose_fields_batch(phi1, phi2))
        fast = np.asarray(wz.compose_fields_zline_batch(phi1, phi2))
        np.testing.assert_allclose(fast, exact, atol=1e-5)

    def test_trainer_env_flag_equivalence(self, monkeypatch):
        """MMREG_ZLINE_COMPOSE=1 must not change the training loss (f32
        payload; the z-line fast path is exact)."""
        from multimodal_registration_tpu.train.config import TrainConfig
        from multimodal_registration_tpu.train.trainer import Trainer, make_loss_fn

        cfg = TrainConfig.from_dict(dict(
            in_shape=[16, 16, 32], num_labels=6, batch_size=1, epochs=1,
            compose_payload_dtype="",
        ))
        trainer = Trainer(cfg)
        params, _ = trainer.init_state()
        rng = np.random.default_rng(0)
        src = jnp.asarray(rng.integers(0, 6, size=(1, 16, 16, 32), dtype=np.uint8))
        trg = jnp.asarray(rng.integers(0, 6, size=(1, 16, 16, 32), dtype=np.uint8))
        key = jax.random.PRNGKey(7)

        monkeypatch.delenv("MMREG_ZLINE_COMPOSE", raising=False)
        loss_fn = make_loss_fn(trainer.model, trainer.engine_cfg, cfg, True)
        base, _ = loss_fn(params, key, src, trg)
        monkeypatch.setenv("MMREG_ZLINE_COMPOSE", "1")
        loss_fn2 = make_loss_fn(trainer.model, trainer.engine_cfg, cfg, True)
        zl, _ = loss_fn2(params, key, src, trg)
        np.testing.assert_allclose(float(zl), float(base), atol=1e-5)
