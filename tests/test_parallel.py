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
        sharded.predict(np.zeros((4, 16, 16, 16)), np.zeros((4, 16, 16, 16)),
                        strict=True)


def test_sharded_registrar_bad_x_falls_back():
    """Non-strict bad-X predict warns and returns the single-device result."""
    cfg = InferenceConfig.from_dict(CFG)
    params = params_template(
        VxmConfig(enc=tuple(cfg.enc), dec=tuple(cfg.dec), compute_dtype="float32")
    )
    rng = np.random.default_rng(1)
    params = jax.tree_util.tree_map(
        lambda x: np.asarray(rng.normal(scale=0.05, size=x.shape), x.dtype), params
    )
    sharded = ShardedRegistrar(cfg, params, make_mesh(8, space=2))
    mov = rng.random((1, 16, 16, 16)).astype(np.float32)
    fx = rng.random((1, 16, 16, 16)).astype(np.float32)
    with pytest.warns(UserWarning, match="falling back"):
        m1, w1 = sharded.predict(mov, fx)
    m2, w2 = Registrar(cfg, params).predict(mov, fx)
    np.testing.assert_allclose(m1, m2, atol=1e-6)
    np.testing.assert_allclose(w1, w2, atol=1e-6)


def test_sharded_registrar_batch_padding():
    """B not divisible by the data axis is padded internally and cropped."""
    cfg = InferenceConfig.from_dict(CFG)
    params = params_template(
        VxmConfig(enc=tuple(cfg.enc), dec=tuple(cfg.dec), compute_dtype="float32")
    )
    rng = np.random.default_rng(2)
    params = jax.tree_util.tree_map(
        lambda x: np.asarray(rng.normal(scale=0.05, size=x.shape), x.dtype), params
    )
    sharded = ShardedRegistrar(cfg, params, make_mesh(8, space=2))  # data=4
    mov = rng.random((3, 32, 16, 16)).astype(np.float32)
    fx = rng.random((3, 32, 16, 16)).astype(np.float32)
    m1, w1 = sharded.predict(mov, fx)
    assert m1.shape[0] == 3 and w1.shape[0] == 3
    m2, w2 = Registrar(cfg, params).predict(mov, fx)
    np.testing.assert_allclose(m1, m2, atol=2e-4)
    np.testing.assert_allclose(w1, w2, atol=2e-4)


def test_make_registrar_factory():
    from multimodal_registration_tpu.infer.sharded import make_registrar

    cfg = InferenceConfig.from_dict(CFG)
    params = params_template(
        VxmConfig(enc=tuple(cfg.enc), dec=tuple(cfg.dec), compute_dtype="float32")
    )
    assert isinstance(make_registrar(cfg, params), Registrar)
    cfg.sharding = {"space": 2}
    reg = make_registrar(cfg, params)
    assert isinstance(reg, ShardedRegistrar)
    assert reg.mesh.shape == {"data": 1, "space": 2}
    cfg.sharding = {"data": 4, "space": 2}
    assert make_registrar(cfg, params).mesh.shape == {"data": 4, "space": 2}
    cfg.sharding = {"data": 16, "space": 2}
    with pytest.raises(ValueError, match="devices"):
        make_registrar(cfg, params)


def test_cli_space_sharded_outputs_identical(tmp_path):
    """VERDICT r2 item 4: the CLI driven with sharding space>1 must produce
    NIfTI outputs identical to the single-chip run (shared body:
    infer/selftest.py, also exercised by the driver contract check)."""
    from multimodal_registration_tpu.infer.selftest import cli_space_parity_check

    cli_space_parity_check(2, str(tmp_path), seed=0)


def test_sharded_registrar_chunked_equals_one_shot():
    """max_batch bounds pairs per forward; chunked output equals unchunked
    (and the plain Registrar), and round16(axis=0) honours the space axis."""
    cfg = InferenceConfig.from_dict(CFG)
    params = params_template(
        VxmConfig(enc=tuple(cfg.enc), dec=tuple(cfg.dec), compute_dtype="float32")
    )
    rng = np.random.default_rng(5)
    params = jax.tree_util.tree_map(
        lambda x: np.asarray(rng.normal(scale=0.05, size=x.shape), x.dtype), params
    )
    mesh = make_mesh(8, space=2)  # data=4
    small = ShardedRegistrar(cfg, params, mesh, max_batch=2)  # chunk = 4*1
    big = ShardedRegistrar(cfg, params, mesh, max_batch=64)   # one shot
    mov = rng.random((6, 32, 16, 16)).astype(np.float32)
    fx = rng.random((6, 32, 16, 16)).astype(np.float32)
    m1, w1 = small.predict(mov, fx)
    m2, w2 = big.predict(mov, fx)
    np.testing.assert_allclose(m1, m2, atol=2e-5)
    np.testing.assert_allclose(w1, w2, atol=2e-5)
    m3, _ = Registrar(cfg, params).predict(mov, fx)
    np.testing.assert_allclose(m1, m3, atol=2e-4)


def test_round16_space_axis_quantum():
    cfg = InferenceConfig.from_dict(dict(CFG, sharding={"space": 2}))
    assert cfg.round16(176, axis=0) == 160   # floor to 32 on the sharded X
    assert cfg.round16(176, axis=1) == 176   # Y/Z keep reference parity
    assert cfg.round16(176) == 176
    cfg2 = InferenceConfig.from_dict(CFG)
    assert cfg2.round16(176, axis=0) == 176  # unsharded: unchanged
