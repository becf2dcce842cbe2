"""Reshape-based 2x max-pool: forward parity with nn.max_pool + valid grads."""

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

from multimodal_registration_tpu.ops.pool import max_pool_2x


def test_forward_matches_nn_max_pool():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 6, 4, 5))
                    .astype(np.float32))
    got = max_pool_2x(x)
    ref = nn.max_pool(x, (2, 2, 2), (2, 2, 2))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_unbatched_rank4():
    x = jnp.asarray(np.random.default_rng(1).normal(size=(8, 6, 4, 3))
                    .astype(np.float32))
    got = max_pool_2x(x)
    ref = nn.max_pool(x[None], (2, 2, 2), (2, 2, 2))[0]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_pallas_bwd_kernel_matches_autodiff_interpret():
    """The VMEM-tiled pool-adjoint kernel (interpret mode) must equal the
    SelectAndScatter routing exactly when there are no ties."""
    from multimodal_registration_tpu.ops.pallas.pool_bwd import max_pool_2x_bwd

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(16, 16, 8, 5)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(8, 8, 4, 5)).astype(np.float32))
    _, vjp = jax.vjp(lambda v: nn.max_pool(v[None], (2, 2, 2), (2, 2, 2))[0], x)
    ref = vjp(g)[0]
    got = max_pool_2x_bwd(x, g, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_pallas_bwd_kernel_odd_blocks_interpret():
    """Deep U-Net levels have dims not divisible by the default block (e.g.
    20x20x24); the adaptive block fit must keep the kernel exact."""
    from multimodal_registration_tpu.ops.pallas.pool_bwd import max_pool_2x_bwd

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(20, 20, 24, 7)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(10, 10, 12, 7)).astype(np.float32))
    _, vjp = jax.vjp(lambda v: nn.max_pool(v[None], (2, 2, 2), (2, 2, 2))[0], x)
    np.testing.assert_allclose(
        np.asarray(max_pool_2x_bwd(x, g, interpret=True)),
        np.asarray(vjp(g)[0]), atol=1e-6)


def test_pallas_bwd_v3_matches_autodiff_interpret():
    """v3 (roll-based z pairing, no XLA split/interleave) must equal the
    SelectAndScatter routing exactly when there are no ties, including at
    deep-level shapes needing the adaptive block fit."""
    from multimodal_registration_tpu.ops.pallas.pool_bwd import max_pool_2x_bwd_v3

    rng = np.random.default_rng(9)
    for shape in ((16, 16, 8, 5), (20, 20, 24, 7)):
        half = tuple(s // 2 for s in shape[:3]) + shape[3:]
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        g = jnp.asarray(rng.normal(size=half).astype(np.float32))
        _, vjp = jax.vjp(
            lambda v: nn.max_pool(v[None], (2, 2, 2), (2, 2, 2))[0], x)
        np.testing.assert_allclose(
            np.asarray(max_pool_2x_bwd_v3(x, g, interpret=True)),
            np.asarray(vjp(g)[0]), atol=1e-6)


def test_pallas_bwd_v3_tie_semantics_match_v2():
    """On tie-heavy integer-valued input the two kernels must route
    identically (z-first, then x, then y; lower index wins each stage)."""
    from multimodal_registration_tpu.ops.pallas.pool_bwd import (
        max_pool_2x_bwd,
        max_pool_2x_bwd_v3,
    )

    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.integers(0, 3, size=(8, 8, 8, 4)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(4, 4, 4, 4)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(max_pool_2x_bwd_v3(x, g, interpret=True)),
        np.asarray(max_pool_2x_bwd(x, g, interpret=True)))


def test_grad_matches_nn_max_pool_without_ties():
    # continuous random values: no ties, so both adjoints route the cotangent
    # to the unique argmax and must agree exactly
    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 8, 8, 8, 4))
                    .astype(np.float32))
    g1 = jax.grad(lambda v: jnp.sum(max_pool_2x(v) ** 2))(x)
    g2 = jax.grad(lambda v: jnp.sum(nn.max_pool(v, (2, 2, 2), (2, 2, 2)) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6)


def test_odd_spatial_dims_gradient_matches_nn_max_pool():
    """VALID pooling drops the trailing element of odd spatial dims; the
    custom VJP must give it zero gradient (crop-recurse-pad), matching
    autodiff through nn.max_pool instead of crashing on a broadcast."""
    rng = np.random.default_rng(9)
    for shape in ((9, 8, 8, 3), (8, 7, 8, 3), (9, 7, 5, 2), (1, 9, 8, 6, 3)):
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        lead = (slice(None),) if len(shape) == 5 else ()

        def pool_ref(v):
            vv = v if len(shape) == 5 else v[None]
            return nn.max_pool(vv, (2, 2, 2), (2, 2, 2))

        loss_w = jnp.asarray(
            rng.normal(size=np.asarray(pool_ref(x)).shape).astype(np.float32))
        ref = jax.grad(lambda v: jnp.sum(pool_ref(v) * loss_w))(x)
        got = jax.grad(
            lambda v: jnp.sum(
                (max_pool_2x(v) if len(shape) == 5 else max_pool_2x(v[None])[0])
                * (loss_w if len(shape) == 5 else loss_w[0])))(x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)
