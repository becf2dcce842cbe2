"""VxmDense model tests: shapes, shape-agnostic weights, gradient flow."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_registration_tpu.models import VxmConfig, VxmDense, init_params

CFG = VxmConfig(enc=(8, 8, 8, 8), dec=(8, 8, 8, 8, 8, 8), int_steps=5, int_res=2, svf_res=2,
                compute_dtype="float32")


def test_output_shapes():
    params = init_params(CFG, inshape=(32, 32, 32))
    model = VxmDense(cfg=CFG)
    mov = jnp.zeros((2, 32, 32, 32, 1))
    fx = jnp.zeros((2, 32, 32, 32, 1))
    out = model.apply(params, mov, fx)
    assert out["moved"].shape == (2, 32, 32, 32, 1)
    # warp at int-res (half resolution): the reference predict() contract
    # (bids_registration.py:327: scale=2 when warp.shape != inshape)
    assert out["warp"].shape == (2, 16, 16, 16, 3)
    assert out["flow_fullres"].shape == (2, 32, 32, 32, 3)
    assert out["svf"].shape == (2, 16, 16, 16, 3)


def test_identity_at_init():
    # flow head init N(0, 1e-5): initial warp ~ 0, moved ~ moving
    params = init_params(CFG, inshape=(32, 32, 32))
    model = VxmDense(cfg=CFG)
    rng = np.random.default_rng(0)
    mov = jnp.asarray(rng.random((1, 32, 32, 32, 1)), jnp.float32)
    fx = jnp.asarray(rng.random((1, 32, 32, 32, 1)), jnp.float32)
    out = model.apply(params, mov, fx)
    np.testing.assert_allclose(np.asarray(out["moved"]), np.asarray(mov), atol=1e-3)


def test_shape_agnostic_weights():
    """Same params must apply at a different inshape — the property the
    reference exploits via get_weights/set_weights (bids_registration.py:311)."""
    params = init_params(CFG, inshape=(32, 32, 32))
    model = VxmDense(cfg=CFG)
    mov = jnp.zeros((1, 48, 64, 32, 1))
    out = model.apply(params, mov, mov)
    assert out["moved"].shape == (1, 48, 64, 32, 1)
    assert out["warp"].shape == (1, 24, 32, 16, 3)


def test_gradients_nonzero():
    params = init_params(CFG, inshape=(32, 32, 32))
    model = VxmDense(cfg=CFG)
    rng = np.random.default_rng(1)
    mov = jnp.asarray(rng.random((1, 32, 32, 32, 1)), jnp.float32)
    fx = jnp.asarray(rng.random((1, 32, 32, 32, 1)), jnp.float32)

    def loss_fn(p):
        out = model.apply(p, mov, fx)
        return jnp.mean((out["moved"] - fx) ** 2)

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_svf_res_1():
    cfg = VxmConfig(enc=(4, 4), dec=(4, 4, 4), int_steps=3, int_res=2, svf_res=1,
                    compute_dtype="float32")
    params = init_params(cfg, inshape=(16, 16, 16))
    out = VxmDense(cfg=cfg).apply(params, jnp.zeros((1, 16, 16, 16, 1)), jnp.zeros((1, 16, 16, 16, 1)))
    assert out["svf"].shape == (1, 16, 16, 16, 3)
    assert out["warp"].shape == (1, 8, 8, 8, 3)


class TestSvfSmoothing:
    """Inference-time SVF smoothing (VxmConfig.svf_smooth_sigma)."""

    def test_smooth_field_constant_fixed_point(self):
        from multimodal_registration_tpu.ops.field import smooth_field

        f = jnp.full((10, 12, 8, 3), 2.5, jnp.float32)
        out = smooth_field(f, 1.5)
        # border renormalization: a constant field is exactly preserved
        np.testing.assert_allclose(np.asarray(out), np.asarray(f), atol=1e-5)

    def test_smooth_field_sigma_zero_identity(self):
        from multimodal_registration_tpu.ops.field import smooth_field

        rng = np.random.default_rng(0)
        f = jnp.asarray(rng.normal(size=(6, 6, 6, 3)).astype(np.float32))
        assert smooth_field(f, 0.0) is f

    def test_smooth_field_reduces_roughness(self):
        from multimodal_registration_tpu.ops.field import smooth_field

        rng = np.random.default_rng(1)
        f = jnp.asarray(rng.normal(size=(16, 16, 16, 3)).astype(np.float32))
        out = np.asarray(smooth_field(f, 1.0))

        def tv(v):
            return sum(
                float(np.abs(np.diff(v, axis=a)).sum()) for a in range(3)
            )

        assert tv(out) < 0.5 * tv(np.asarray(f))
        # mean is approximately preserved (renormalized kernel sums to 1)
        np.testing.assert_allclose(out.mean(), np.asarray(f).mean(), atol=2e-2)

    def test_model_smoothing_equals_manual(self):
        """A model with svf_smooth_sigma set produces exactly the baseline
        model's SVF run through smooth_field, then integrated."""
        from dataclasses import replace

        from multimodal_registration_tpu.ops.field import smooth_field
        from multimodal_registration_tpu.ops.integrate import integrate_svf

        import flax

        params = init_params(CFG, inshape=(32, 32, 32), seed=3)
        # make the SVF non-trivial: scale up only the ~zero-init flow head
        params = flax.core.unfreeze(params)
        params["params"]["flow"] = jax.tree_util.tree_map(
            lambda x: x * 1e4, params["params"]["flow"]
        )
        rng = np.random.default_rng(2)
        mov = jnp.asarray(rng.random((1, 32, 32, 32, 1)).astype(np.float32))
        fx = jnp.asarray(rng.random((1, 32, 32, 32, 1)).astype(np.float32))

        base = VxmDense(cfg=CFG).apply(params, mov, fx)
        cfg_s = replace(CFG, svf_smooth_sigma=1.0)
        sm = VxmDense(cfg=cfg_s).apply(params, mov, fx)

        manual_svf = smooth_field(base["svf"][0], 1.0)
        np.testing.assert_allclose(
            np.asarray(sm["svf"][0]), np.asarray(manual_svf), atol=1e-5
        )
        manual_warp = integrate_svf(
            manual_svf, CFG.int_steps,
            payload_dtype=jnp.dtype(CFG.integrate_payload_dtype),
        )
        np.testing.assert_allclose(
            np.asarray(sm["warp"][0]), np.asarray(manual_warp), atol=1e-4
        )

    def test_registrar_override_plumbing(self):
        from multimodal_registration_tpu.infer.config import InferenceConfig
        from multimodal_registration_tpu.infer.register import Registrar
        from multimodal_registration_tpu.models.vxm_dense import params_template

        cfg = InferenceConfig.from_dict(
            dict(enc=[8] * 4, dec=[8] * 6, compute_dtype="float32",
                 svf_smooth_sigma=0.5, model1_svf_smooth_sigma=2.0)
        )
        params = params_template(CFG)
        assert Registrar(cfg, params).vxm_cfg.svf_smooth_sigma == 0.5
        assert Registrar(
            cfg, params, svf_smooth_sigma=cfg.model1_svf_smooth_sigma
        ).vxm_cfg.svf_smooth_sigma == 2.0

    def test_default_sigma_cascade_only(self):
        """Defaults: single-model registration stays unsmoothed (reference
        semantics) while the cascade's step-1 gets sigma 3.0 — the adopted
        anti-folding lever (PERF.md round 4c, twostep_parity_artifact)."""
        from multimodal_registration_tpu.infer.config import InferenceConfig

        cfg = InferenceConfig()
        assert cfg.svf_smooth_sigma == 0.0
        assert cfg.model1_svf_smooth_sigma == 3.0
        # JSON null restores inherit-from-svf_smooth_sigma (raw cascade)
        raw = InferenceConfig.from_dict(dict(model1_svf_smooth_sigma=None))
        assert raw.model1_svf_smooth_sigma is None
        # null for the base sigma means off, not a float(None) crash
        cfg0 = InferenceConfig.from_dict(dict(svf_smooth_sigma=None))
        assert cfg0.svf_smooth_sigma == 0.0
        from multimodal_registration_tpu.infer.register import Registrar
        from multimodal_registration_tpu.models.vxm_dense import params_template

        r = Registrar(cfg0, params_template(CFG),
                      svf_smooth_sigma=cfg0.model1_svf_smooth_sigma)
        assert r.vxm_cfg.svf_smooth_sigma == 3.0
