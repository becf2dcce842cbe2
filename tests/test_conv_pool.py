"""Fused first-conv+LeakyReLU+maxpool Pallas kernel: equivalence tests.

Runs the kernel in Pallas interpret mode on CPU (Mosaic compilation needs a
TPU backend; hardware timing lives in benchmarks/fused_conv_probe.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

import multimodal_registration_tpu.ops.pallas.conv_pool as cp


@pytest.fixture()
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(cp.pl, "pallas_call", patched)


def _rand(shape, seed, scale=1.0):
    return (np.random.default_rng(seed).normal(scale=scale, size=shape)
            .astype(np.float32))


class TestKernel:
    def test_matches_reference(self, interpret_pallas):
        x = _rand((16, 16, 8, 2), 0)
        w = _rand((3, 3, 3, 2, 5), 1, 0.2)
        b = _rand((5,), 2)
        got = np.asarray(cp.conv3_lrelu_pool(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
            block=(2, 4), out_dtype=jnp.float32))
        ref = np.asarray(cp.conv3_lrelu_pool_reference(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
        assert got.shape == ref.shape == (8, 8, 4, 5)
        # kernel computes in bf16 (like the production XLA conv path)
        np.testing.assert_allclose(got, ref, atol=5e-2, rtol=5e-2)

    def test_wider_channels_and_blocks(self, interpret_pallas):
        x = _rand((8, 16, 16, 2), 3)
        w = _rand((3, 3, 3, 2, 8), 4, 0.2)
        b = _rand((8,), 5)
        for block in ((2, 8), (4, 8)):
            got = np.asarray(cp.conv3_lrelu_pool(
                jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                block=block, out_dtype=jnp.float32))
            ref = np.asarray(cp.conv3_lrelu_pool_reference(
                jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
            np.testing.assert_allclose(got, ref, atol=5e-2, rtol=5e-2)

    def test_negative_values_leaky(self, interpret_pallas):
        # all-negative pre-activations exercise the leaky slope through the pool
        x = _rand((8, 8, 8, 1), 6)
        w = -np.abs(_rand((3, 3, 3, 1, 4), 7, 0.3))
        b = -np.abs(_rand((4,), 8)) - 5.0
        got = np.asarray(cp.conv3_lrelu_pool(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
            block=(2, 2), out_dtype=jnp.float32))
        ref = np.asarray(cp.conv3_lrelu_pool_reference(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
        assert (ref < 0).all()
        np.testing.assert_allclose(got, ref, atol=5e-2, rtol=5e-2)


class TestUnetIntegration:
    def test_fused_unet_matches_plain(self, interpret_pallas, monkeypatch):
        """Full U-Net with the fused first level (env-gated) must match the
        plain path; param trees must be identical."""
        from multimodal_registration_tpu.models.unet import Unet

        monkeypatch.setenv("MMREG_FUSED_FIRST_CONV", "1")
        # the backend gate blocks CPU; bypass it for the interpret-mode test
        import multimodal_registration_tpu.models.unet as unet_mod

        monkeypatch.setattr(unet_mod.jax if hasattr(unet_mod, "jax") else jax,
                            "default_backend", lambda: "tpu")

        model = Unet(enc_nf=(4, 4), dec_nf=(4, 4, 4), nb_upsample_skips=1,
                     dtype=jnp.float32)
        x = jnp.asarray(_rand((1, 16, 16, 16, 2), 9))
        params = model.init(jax.random.PRNGKey(0), x)

        monkeypatch.setenv("MMREG_FUSED_FIRST_CONV", "0")
        plain = model.apply(params, x)
        plain_params = jax.tree_util.tree_map(lambda a: a.shape, params)

        monkeypatch.setenv("MMREG_FUSED_FIRST_CONV", "1")
        fused = model.apply(params, x)
        fused_params = jax.tree_util.tree_map(
            lambda a: a.shape,
            model.init(jax.random.PRNGKey(0), x),
        )
        assert plain_params == fused_params
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(plain), atol=5e-2, rtol=5e-2)
