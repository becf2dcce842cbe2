"""warp_onehot must equal linear-warping the dense one-hot (value + grad)."""

import numpy as np

import jax
import jax.numpy as jnp

from multimodal_registration_tpu.ops.warp import warp, warp_onehot


def test_matches_dense_onehot_warp():
    rng = np.random.default_rng(0)
    L = 5
    lab = jnp.asarray(rng.integers(0, L, size=(10, 11, 12)), jnp.int32)
    flow = jnp.asarray(rng.normal(scale=1.3, size=(10, 11, 12, 3)), jnp.float32)
    dense = warp(jax.nn.one_hot(lab, L, dtype=jnp.float32), flow, interp="linear")
    light = warp_onehot(lab, flow, L)
    np.testing.assert_allclose(np.asarray(light), np.asarray(dense), atol=1e-5)


def test_gradient_matches_dense():
    rng = np.random.default_rng(1)
    L = 3
    lab = jnp.asarray(rng.integers(0, L, size=(6, 6, 6)), jnp.int32)
    flow = jnp.asarray(rng.normal(scale=0.7, size=(6, 6, 6, 3)), jnp.float32)
    tgt = jnp.asarray(rng.random((6, 6, 6, L)), jnp.float32)

    def loss_dense(f):
        p = warp(jax.nn.one_hot(lab, L, dtype=jnp.float32), f, interp="linear")
        return jnp.mean((p - tgt) ** 2)

    def loss_light(f):
        return jnp.mean((warp_onehot(lab, f, L) - tgt) ** 2)

    g1 = jax.grad(loss_dense)(flow)
    g2 = jax.grad(loss_light)(flow)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=1e-5)


def test_soft_hard_shared_gather():
    """warp_labels_soft_hard: soft must equal warp_onehot, hard must equal
    the nearest-neighbor warp of the raw labels (round-half-to-even)."""
    from multimodal_registration_tpu.ops.warp import (
        warp,
        warp_labels_soft_hard,
    )

    rng = np.random.RandomState(0)
    labels = jnp.asarray(rng.randint(0, 9, size=(7, 6, 8)).astype(np.int32))
    flow = jnp.asarray((rng.rand(7, 6, 8, 3).astype(np.float32) - 0.5) * 4)
    soft, hard = warp_labels_soft_hard(labels, flow, 9)
    np.testing.assert_allclose(
        np.asarray(soft), np.asarray(warp_onehot(labels, flow, 9)), atol=1e-6
    )
    ref_hard = warp(labels.astype(jnp.float32), flow, interp="nearest")
    np.testing.assert_array_equal(
        np.asarray(hard), np.asarray(ref_hard).astype(np.int32)
    )
