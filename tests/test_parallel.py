"""Mesh/sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_registration_tpu.infer.config import InferenceConfig
from multimodal_registration_tpu.infer.sharded import ShardedRegistrar
from multimodal_registration_tpu.infer.register import Registrar
from multimodal_registration_tpu.models.vxm_dense import VxmConfig, params_template
from multimodal_registration_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated,
    setup_devices,
)

CFG = dict(enc=[4, 4, 4, 4], dec=[4, 4, 4, 4, 4, 4], compute_dtype="float32")


def test_setup_devices():
    devs, n = setup_devices(None)
    assert n == 8
    devs, n = setup_devices("0")
    assert n == 1
    devs, n = setup_devices("0,2,4")
    assert n == 3


def test_make_mesh_shapes():
    m = make_mesh(8)
    assert m.shape == {"data": 8, "space": 1}
    m2 = make_mesh(8, space=2)
    assert m2.shape == {"data": 4, "space": 2}
    with pytest.raises(ValueError):
        make_mesh(6, space=4)


def test_shardings_build():
    m = make_mesh(4)
    assert batch_sharding(m) is not None
    assert replicated(m) is not None


def test_sharded_registrar_matches_single_chip():
    """Spatially-sharded forward must equal the unsharded result."""
    cfg = InferenceConfig.from_dict(CFG)
    params = params_template(
        VxmConfig(enc=tuple(cfg.enc), dec=tuple(cfg.dec), compute_dtype="float32")
    )
    # give the convs nonzero weights so the test is non-trivial
    rng = np.random.default_rng(0)
    params = jax.tree_util.tree_map(
        lambda x: np.asarray(rng.normal(scale=0.05, size=x.shape), x.dtype), params
    )
    mesh = make_mesh(8, space=2)
    sharded = ShardedRegistrar(cfg, params, mesh)
    plain = Registrar(cfg, params)

    mov = rng.random((4, 32, 16, 16)).astype(np.float32)
    fx = rng.random((4, 32, 16, 16)).astype(np.float32)
    m1, w1 = sharded.predict(mov, fx)
    m2, w2 = plain.predict(mov, fx)
    np.testing.assert_allclose(m1, m2, atol=2e-4)
    np.testing.assert_allclose(w1, w2, atol=2e-4)


def test_sharded_registrar_rejects_bad_x():
    cfg = InferenceConfig.from_dict(CFG)
    params = params_template(
        VxmConfig(enc=tuple(cfg.enc), dec=tuple(cfg.dec), compute_dtype="float32")
    )
    mesh = make_mesh(8, space=2)
    sharded = ShardedRegistrar(cfg, params, mesh)
    with pytest.raises(ValueError, match="not divisible"):
        sharded.predict(np.zeros((4, 16, 16, 16)), np.zeros((4, 16, 16, 16)))
