"""conv3d_tap2d (three-Conv2D lowering) must match XLA's native Conv3D.

The decomposition is exact up to f32 partial-sum ordering — see
`ops/conv3.py` and `benchmarks/conv2d_decomp_probe.py`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_registration_tpu.ops.conv3 import conv3d_direct, conv3d_tap2d


def _rand(shape, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)


@pytest.mark.parametrize("tap_axis", [1, 3])
@pytest.mark.parametrize("stride", [1, 2])
@pytest.mark.parametrize("shape,cin,cout", [
    ((8, 10, 12), 3, 5),
    ((16, 16, 16), 2, 4),
])
def test_tap2d_matches_direct(tap_axis, stride, shape, cin, cout):
    x = _rand((2, *shape, cin), 0)
    k = _rand((3, 3, 3, cin, cout), 1) * 0.1
    ref = np.asarray(conv3d_direct(x, k, stride))
    got = np.asarray(conv3d_tap2d(x, k, stride, tap_axis=tap_axis))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_tap2d_gradients_match_direct():
    x = _rand((1, 8, 8, 8, 3), 2)
    k = _rand((3, 3, 3, 3, 4), 3) * 0.1

    def loss(f):
        def inner(x, k):
            y = f(x, k)
            return jnp.sum(y * y)
        return inner

    gx_ref, gk_ref = jax.grad(loss(conv3d_direct), argnums=(0, 1))(x, k)
    gx, gk = jax.grad(loss(conv3d_tap2d), argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_ref), rtol=1e-4, atol=1e-4)


def test_tap2d_rejects_non3cube_kernel():
    x = _rand((1, 8, 8, 8, 2))
    k = _rand((1, 1, 1, 2, 4))
    with pytest.raises(ValueError, match="3x3x3"):
        conv3d_tap2d(x, k)


class TestUnetDecomp:
    """MMREG_CONV2D_DECOMP=1 must be a pure lowering change for the U-Net."""

    def _apply(self, monkeypatch, flag, dtype):
        import flax.linen as nn_  # noqa: F401
        from multimodal_registration_tpu.models.unet import Unet

        monkeypatch.setenv("MMREG_CONV2D_DECOMP", flag)
        net = Unet(enc_nf=(4, 4), dec_nf=(4, 4, 4), nb_upsample_skips=1,
                   dtype=dtype)
        x = _rand((1, 16, 16, 16, 2), 7)
        params = net.init(jax.random.PRNGKey(0), x)
        return params, net.apply(params, x)

    def test_forward_matches_default(self, monkeypatch):
        p0, y0 = self._apply(monkeypatch, "0", jnp.float32)
        p1, y1 = self._apply(monkeypatch, "1", jnp.float32)
        assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   rtol=1e-5, atol=1e-5)

    def test_bf16_forward_close(self, monkeypatch):
        _, y0 = self._apply(monkeypatch, "0", jnp.bfloat16)
        _, y1 = self._apply(monkeypatch, "1", jnp.bfloat16)
        np.testing.assert_allclose(
            np.asarray(y1, np.float32), np.asarray(y0, np.float32),
            rtol=0.06, atol=0.05)

    def test_grads_match_default(self, monkeypatch):
        from multimodal_registration_tpu.models.unet import Unet

        net = Unet(enc_nf=(4, 4), dec_nf=(4, 4, 4), nb_upsample_skips=1,
                   dtype=jnp.float32)
        x = _rand((1, 16, 16, 16, 2), 8)
        params = net.init(jax.random.PRNGKey(0), x)

        def loss(p):
            y = net.apply(p, x)
            return jnp.sum(y * y)

        monkeypatch.setenv("MMREG_CONV2D_DECOMP", "0")
        g0 = jax.grad(loss)(params)
        monkeypatch.setenv("MMREG_CONV2D_DECOMP", "1")
        g1 = jax.grad(loss)(params)
        for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-4)
