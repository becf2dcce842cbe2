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


def test_tap2d_slab_matches_direct():
    """Multi-slab (budget-forced) z-tap decomposition equals Conv3D, including
    a ragged last slab (Z=11 over 4 slabs of 3)."""
    from multimodal_registration_tpu.ops.conv3 import conv3d_tap2d_slab

    x = _rand((2, 8, 9, 11, 3), 5)
    k = _rand((3, 3, 3, 3, 4), 6) * 0.1
    ref = np.asarray(conv3d_direct(x, k))
    one = np.asarray(conv3d_tap2d_slab(x, k, out_dtype=jnp.float32))
    # budget of one slab's bytes at nz=3 -> forces ceil(acc/budget) slabs
    acc_bytes = 2 * 8 * 9 * 11 * 4 * 4
    many = np.asarray(conv3d_tap2d_slab(
        x, k, out_dtype=jnp.float32, max_acc_bytes=acc_bytes // 4 + 1))
    np.testing.assert_allclose(one, ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(many, ref, rtol=1e-5, atol=1e-5)


def test_tap2d_slab_int8_exact():
    """int32 accumulators + int32 out: the slabbed decomposition is
    bit-identical to the direct int8 Conv3D regardless of slab count."""
    from multimodal_registration_tpu.ops.conv3 import conv3d_tap2d_slab

    kx, kk = jax.random.split(jax.random.PRNGKey(9))
    xq = jax.random.randint(kx, (1, 6, 7, 10, 8), -127, 128, jnp.int8)
    kq = jax.random.randint(kk, (3, 3, 3, 8, 5), -127, 128, jnp.int8)
    ref = np.asarray(conv3d_direct(xq, kq, out_dtype=jnp.int32))
    for budget in (1 << 30, 6 * 7 * 5 * 4 * 3 + 1, 1):
        got = np.asarray(conv3d_tap2d_slab(
            xq, kq, out_dtype=jnp.int32, acc_dtype=jnp.int32,
            max_acc_bytes=budget))
        np.testing.assert_array_equal(got, ref)


def test_tap2d_slab_gradients_match_direct():
    """The slab path is plain XLA ops — its autodiff must match Conv3D."""
    from multimodal_registration_tpu.ops.conv3 import conv3d_tap2d_slab

    x = _rand((1, 6, 6, 8, 3), 10)
    k = _rand((3, 3, 3, 3, 4), 11) * 0.1

    def loss_ref(x, k):
        return jnp.sum(conv3d_direct(x, k) ** 2)

    def loss_slab(x, k):
        y = conv3d_tap2d_slab(x, k, out_dtype=jnp.float32, max_acc_bytes=1)
        return jnp.sum(y ** 2)

    gx_ref, gk_ref = jax.grad(loss_ref, argnums=(0, 1))(x, k)
    gx, gk = jax.grad(loss_slab, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_ref), rtol=1e-4, atol=1e-4)


def test_tap2d_int8_exact_vs_direct():
    """int8 x int8 -> int32: the decomposition is EXACT (integer adds commute).

    Mirrors the quantized-inference lowering in
    `models/unet.py::ConvBlock._int8_conv`."""
    kx, kk = jax.random.split(jax.random.PRNGKey(4))
    xq = jax.random.randint(kx, (1, 9, 10, 11, 8), -127, 128, jnp.int8)
    kq = jax.random.randint(kk, (3, 3, 3, 8, 6), -127, 128, jnp.int8)
    ref = np.asarray(conv3d_direct(xq, kq, out_dtype=jnp.int32))
    for tap_axis in (1, 3):
        got = np.asarray(conv3d_tap2d(xq, kq, out_dtype=jnp.int32,
                                      tap_axis=tap_axis))
        np.testing.assert_array_equal(got, ref)


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

    def test_bf16_grads_work_and_track_default(self, monkeypatch):
        """Regression: bf16 activations + f32 partial sums broke the conv
        TRANSPOSE (dtype-mismatch in conv_general_dilated) — training with
        the decomp failed on TPU while the f32-only grad test passed. The
        decomp now accumulates in the compute dtype; bf16 grads must exist,
        be finite, and track the direct lowering within bf16 noise."""
        from multimodal_registration_tpu.models.unet import Unet

        net = Unet(enc_nf=(4, 4), dec_nf=(4, 4, 4), nb_upsample_skips=1,
                   dtype=jnp.bfloat16)
        x = _rand((1, 16, 16, 16, 2), 12)
        params = net.init(jax.random.PRNGKey(0), x)

        def loss(p):
            y = net.apply(p, x).astype(jnp.float32)
            return jnp.mean(y * y)

        monkeypatch.setenv("MMREG_CONV2D_DECOMP", "0")
        g0 = jax.grad(loss)(params)
        monkeypatch.setenv("MMREG_CONV2D_DECOMP", "1")
        g1 = jax.grad(loss)(params)  # raised TypeError before the fix
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
            assert np.all(np.isfinite(b))
            denom = np.maximum(np.max(np.abs(a)), 1e-6)
            assert np.max(np.abs(a - b)) / denom < 0.1

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
