"""Loss-function tests vs the reference formulas."""

import numpy as np

import jax.numpy as jnp

from multimodal_registration_tpu import losses


def _onehot(lab, L):
    return np.eye(L, dtype=np.float32)[lab]


class TestDice:
    def test_perfect_match(self):
        lab = np.random.default_rng(0).integers(0, 4, (1, 8, 8, 8))
        oh = _onehot(lab, 4)
        assert np.isclose(float(losses.dice_loss(jnp.asarray(oh), jnp.asarray(oh))), -1.0)

    def test_formula_matches_reference(self):
        # vxm.losses.Dice (train_synthmorph.py:306): mean over channels of
        # divide_no_nan(2*sum(t*p), sum(t+p)), negated
        rng = np.random.default_rng(1)
        t = rng.random((2, 6, 6, 6, 3)).astype(np.float32)
        p = rng.random((2, 6, 6, 6, 3)).astype(np.float32)
        ours = float(losses.dice_loss(jnp.asarray(t), jnp.asarray(p)))
        top = 2 * (t * p).sum(axis=(1, 2, 3))
        bot = (t + p).sum(axis=(1, 2, 3))
        ref = -np.mean(np.where(bot > 0, top / np.where(bot > 0, bot, 1), 0))
        np.testing.assert_allclose(ours, ref, rtol=1e-5)


class TestDiceZeropad:
    def test_masks_padding(self):
        # two maps identical inside; one has a zero-padded (label-0) border
        lab = np.ones((1, 8, 8, 8), np.int64)
        lab_pad = lab.copy()
        lab_pad[0, :2] = 0  # zero-padding region
        t = _onehot(lab_pad, 2)
        p = _onehot(lab, 2)
        # inside the non-padded region the maps agree → dice == 1
        val = float(losses.dice_loss_zeropad(jnp.asarray(t), jnp.asarray(p)))
        np.testing.assert_allclose(val, -1.0, atol=1e-6)

    def test_background_excluded_from_mean(self):
        lab = np.zeros((1, 4, 4, 4), np.int64)
        lab[0, 1:3, 1:3, 1:3] = 1
        t = _onehot(lab, 2)
        val = float(losses.dice_loss_zeropad(jnp.asarray(t), jnp.asarray(t)))
        np.testing.assert_allclose(val, -1.0, atol=1e-6)

    def test_requires_5d(self):
        import pytest

        with pytest.raises(ValueError):
            losses.dice_loss_zeropad(jnp.zeros((4, 4, 4, 2)), jnp.zeros((4, 4, 4, 2)))


class TestGrad:
    def test_constant_field_zero(self):
        f = jnp.ones((1, 6, 6, 6, 3))
        assert float(losses.grad_loss(f)) == 0.0

    def test_formula_matches_reference(self):
        # vxm.losses.Grad('l2', mult): per axis mean of squared forward diffs,
        # averaged over axes, times mult (train_synthmorph.py:307)
        rng = np.random.default_rng(2)
        f = rng.random((2, 5, 6, 7, 3)).astype(np.float32)
        ours = float(losses.grad_loss(jnp.asarray(f), "l2", loss_mult=2.5))
        ref_axes = []
        for ax in (1, 2, 3):
            d = np.diff(f, axis=ax) ** 2
            ref_axes.append(d.reshape(2, -1).mean(-1))
        ref = 2.5 * np.mean(np.stack(ref_axes).mean(0))
        np.testing.assert_allclose(ours, ref, rtol=1e-5)

    def test_l1(self):
        rng = np.random.default_rng(3)
        f = rng.standard_normal((1, 4, 4, 4, 3)).astype(np.float32)
        ours = float(losses.grad_loss(jnp.asarray(f), "l1"))
        assert ours > 0


class TestNCC:
    def test_identical_images(self):
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.random((1, 12, 12, 12, 1)).astype(np.float32))
        val = float(losses.ncc_loss(x, x, win=5))
        assert val < -0.9  # near-perfect correlation
