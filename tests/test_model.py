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
