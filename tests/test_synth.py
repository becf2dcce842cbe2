"""Tests for the on-device synthesis engine."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_registration_tpu import synth


class TestPerlin:
    def test_shape_and_determinism(self):
        key = jax.random.PRNGKey(0)
        a = synth.draw_perlin(key, (16, 16, 16, 2), scales=[4, 8], max_std=1.0)
        b = synth.draw_perlin(key, (16, 16, 16, 2), scales=[4, 8], max_std=1.0)
        assert a.shape == (16, 16, 16, 2)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_std_bounds(self):
        key = jax.random.PRNGKey(1)
        out = synth.draw_perlin(key, (24, 24, 24, 1), scales=[2], max_std=0.0)
        np.testing.assert_allclose(np.asarray(out), 0.0)

    def test_multiscale_is_sum(self):
        # single-scale draws summed give same statistics family; just smoke
        key = jax.random.PRNGKey(2)
        out = synth.draw_perlin(key, (8, 8, 8), scales=[1], min_std=1.0, max_std=1.0)
        assert 0.5 < float(jnp.std(out)) < 1.5

    def test_5d_field_shape(self):
        # per-channel warps: (X, Y, Z, L, 3) as in train_synthmorph.py:61-64
        key = jax.random.PRNGKey(3)
        out = synth.draw_perlin(key, (8, 8, 8, 4, 3), scales=[4], max_std=2.0)
        assert out.shape == (8, 8, 8, 4, 3)


class TestLabelMaps:
    def test_generate_label_map(self):
        key = jax.random.PRNGKey(0)
        lab = synth.generate_label_map(
            key, (16, 16, 16), num_labels=5, im_scales=[4, 8], def_scales=[4],
        )
        lab = np.asarray(lab)
        assert lab.shape == (16, 16, 16)
        assert lab.dtype == np.uint8
        assert lab.max() < 5
        # a healthy map uses several labels
        assert len(np.unique(lab)) >= 3

    def test_generate_many(self):
        maps = synth.generate_label_maps(
            jax.random.PRNGKey(1), 3, (8, 8, 8), 4, im_scales=[4], def_scales=[4]
        )
        assert len(maps) == 3
        assert all(m.shape == (8, 8, 8) for m in maps)


class TestImageEngine:
    def test_outputs(self):
        cfg = synth.ImageEngineConfig(
            num_labels=4, vel_res=4.0, bias_res=8.0, blur_radius=2
        )
        key = jax.random.PRNGKey(0)
        lab = jax.random.randint(jax.random.PRNGKey(9), (16, 16, 16), 0, 4)
        img, onehot = synth.labels_to_image(key, lab, cfg)
        img, onehot = np.asarray(img), np.asarray(onehot)
        assert img.shape == (16, 16, 16)
        assert onehot.shape == (16, 16, 16, 4)
        assert img.min() >= 0.0 and img.max() <= 1.0 + 1e-5
        # soft one-hot rows sum to 1 (float rounding from the 8-corner weights)
        np.testing.assert_allclose(onehot.sum(-1), 1.0, atol=1e-5)
        # boundaries are SOFT (linear interp of the one-hot — the reference
        # generator contract); some values strictly between 0 and 1 exist
        assert ((onehot > 0.01) & (onehot < 0.99)).any()

    def test_jit_and_vmap(self):
        cfg = synth.ImageEngineConfig(num_labels=3, vel_res=4.0, bias_res=8.0, blur_radius=2)
        lab = jax.random.randint(jax.random.PRNGKey(9), (2, 8, 8, 8), 0, 3)
        keys = jax.random.split(jax.random.PRNGKey(0), 2)
        f = jax.jit(jax.vmap(lambda k, l: synth.labels_to_image(k, l, cfg)))
        img, onehot = f(keys, lab)
        assert img.shape == (2, 8, 8, 8)
        assert onehot.shape == (2, 8, 8, 8, 3)


class TestAugment:
    def test_flips_consistent_pair(self):
        key = jax.random.PRNGKey(4)
        a = jnp.arange(8 * 8 * 8, dtype=jnp.float32).reshape(8, 8, 8)
        b = a * 2
        fa, fb = synth.random_flips(key, (a, b))
        # flips must be the same for both volumes
        np.testing.assert_allclose(np.asarray(fb), np.asarray(fa) * 2)

    def test_flip_distribution(self):
        # over many keys, each axis should be flipped ~50% of the time
        flips = []
        x = jnp.arange(4 * 4 * 4, dtype=jnp.float32).reshape(4, 4, 4)
        for i in range(64):
            (y,) = synth.random_flips(jax.random.PRNGKey(i), (x,))
            flips.append(not np.allclose(np.asarray(y)[:, 0, 0], np.asarray(x)[:, 0, 0]))
        frac = np.mean(flips)
        assert 0.25 < frac < 0.75

    def test_zero_borders_box(self):
        key = jax.random.PRNGKey(5)
        vol = jnp.ones((16, 16, 16))
        out = np.asarray(synth.random_zero_borders(key, vol, scale=4))
        # inner half of the volume must be untouched (borders only affect
        # up to 1/scale = 1/4 of each side)
        assert out[4:12, 4:12, 4:12].min() == 1.0
        assert out.min() >= 0.0

    def test_maybe_zero_borders_frac(self):
        vol = jnp.ones((8, 8, 8))
        changed = 0
        for i in range(32):
            out = synth.maybe_zero_borders(jax.random.PRNGKey(i), vol, 4, 0.5)
            changed += int(np.asarray(out).sum() < vol.size)
        assert 4 < changed < 28


class TestLabelMaps2D:
    """2-D label-map generation + PNG save (train_synthmorph.py:53,71-80)."""

    def test_generate_2d_map(self):
        import jax
        from multimodal_registration_tpu.synth.labelmaps import generate_label_map

        m = np.asarray(generate_label_map(
            jax.random.PRNGKey(0), (24, 20), num_labels=5,
            im_scales=[4, 8], def_scales=[4],
        ))
        assert m.shape == (24, 20)
        assert m.dtype == np.uint8
        assert m.max() < 5
        assert len(np.unique(m)) > 1  # not degenerate

    def test_generate_2d_distinct_maps(self):
        import jax
        from multimodal_registration_tpu.synth.labelmaps import generate_label_maps

        maps = generate_label_maps(
            jax.random.PRNGKey(1), 2, (16, 16), 4, im_scales=[4], def_scales=[4],
        )
        assert len(maps) == 2 and not np.array_equal(maps[0], maps[1])

    def test_png_save_via_training_cli(self, tmp_path):
        from multimodal_registration_tpu.train.config import TrainConfig
        from multimodal_registration_tpu.train.cli import run_training

        cfg = TrainConfig.from_dict(dict(
            in_shape=[16, 16], num_labels=4, num_maps=2,
            im_scales=[4], def_scales=[4],
            gen_label_only=True, save_label=True, add_str="",
            label_dir=str(tmp_path / "labels"),
            model_dir=str(tmp_path / "m"), log_dir="",
        ))
        out = run_training(cfg)
        assert out["label_maps"] == 2
        pngs = sorted(os.listdir(cfg.label_dir))
        assert pngs == ["label_map_1.png", "label_map_2.png"]
        import matplotlib.image as mpimg

        img = mpimg.imread(os.path.join(cfg.label_dir, pngs[0]))
        assert img.shape[:2] == (16, 16)  # readable PNG artifact

    def test_rejects_bad_ndim(self):
        import jax
        import pytest
        from multimodal_registration_tpu.synth.labelmaps import generate_label_map

        with pytest.raises(ValueError):
            generate_label_map(jax.random.PRNGKey(0), (16,), 4)


def test_perlin_fixed_stds():
    """stds= must override the internal per-scale std draw (zero std at one
    scale removes that scale's contribution entirely)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimodal_registration_tpu.synth.perlin import draw_perlin

    key = jax.random.PRNGKey(0)
    z = np.asarray(draw_perlin(key, (8, 8, 8, 1), [2, 4], stds=[0.0, 0.0]))
    np.testing.assert_allclose(z, 0.0)
    one_scale = np.asarray(draw_perlin(key, (8, 8, 8, 1), [2, 4], stds=[1.0, 0.0]))
    assert np.abs(one_scale).max() > 0
    import pytest

    with pytest.raises(ValueError, match="one std per scale"):
        draw_perlin(key, (8, 8, 8, 1), [2, 4], stds=[1.0])


def test_label_map_shared_scale_stds():
    """Label-map generation must share the per-scale Perlin stds across all
    label channels (reference draws one (X,Y,Z,L) tensor per scale)."""
    import jax
    import numpy as np

    from multimodal_registration_tpu.synth.labelmaps import generate_label_map

    # smoke: still produces valid maps after the shared-std refactor
    # (scales sized for the tiny test volume — defaults are for 160+^3)
    lab = np.asarray(
        generate_label_map(
            jax.random.PRNGKey(3), (12, 12, 12), 5,
            im_scales=(2, 4), def_scales=(2, 4),
        )
    )
    assert lab.shape == (12, 12, 12)
    assert lab.max() < 5
    assert len(np.unique(lab)) > 1


def test_label_warp_axis_correlation():
    """Reference parity (`train_synthmorph.py:61-64` + neurite draw_perlin):
    the label axis of the warp draw is downscaled like a spatial axis —
    at scale >= L all labels share ONE warp; below that, neighbouring labels
    are more correlated than distant ones."""
    import jax
    import jax.numpy as jnp

    from multimodal_registration_tpu.synth.labelmaps import _warp_for_label
    from multimodal_registration_tpu.ops.resize import _interp_matrix

    shape3, L = (8, 8, 8), 6
    key = jax.random.PRNGKey(0)

    # cl = 1 (scale >= L): identical warps for every label
    noise1 = jax.random.normal(key, (2, 2, 2, 1, 3))
    W1 = jnp.asarray(_interp_matrix(L, 1, float(L)), jnp.float32)
    w0 = _warp_for_label(0, [noise1], [W1], shape3)
    wL = _warp_for_label(L - 1, [noise1], [W1], shape3)
    np.testing.assert_allclose(np.asarray(w0), np.asarray(wL), atol=1e-6)

    # cl = 3: adjacent labels closer than distant ones
    noise3 = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 2, 3, 3))
    W3 = jnp.asarray(_interp_matrix(L, 3, L / 3.0), jnp.float32)
    ws = [np.asarray(_warp_for_label(l, [noise3], [W3], shape3)) for l in range(L)]
    d_adj = np.mean([np.abs(ws[l] - ws[l + 1]).mean() for l in range(L - 1)])
    d_far = np.abs(ws[0] - ws[L - 1]).mean()
    assert d_adj < d_far


def test_generate_label_map_still_deterministic_and_valid():
    import jax

    from multimodal_registration_tpu.synth.labelmaps import generate_label_map

    m1 = generate_label_map(jax.random.PRNGKey(3), (12, 12, 12), 5,
                            im_scales=(4, 8), def_scales=(4, 8))
    m2 = generate_label_map(jax.random.PRNGKey(3), (12, 12, 12), 5,
                            im_scales=(4, 8), def_scales=(4, 8))
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    assert m1.dtype == np.uint8 and int(np.asarray(m1).max()) < 5


def test_preintegrated_svf_path_matches_in_engine_draw():
    """labels_to_image_full with a pre-integrated phi_small (the trainer's
    batched-integration path) must reproduce the in-engine draw+integrate
    exactly — same key schedule, same field, same image."""
    import jax
    import jax.numpy as jnp

    from multimodal_registration_tpu.ops.integrate import (
        integrate_svf,
        integrate_svf_batch,
    )
    from multimodal_registration_tpu.synth.image_engine import (
        ImageEngineConfig,
        draw_svf_small,
        labels_to_image_full,
    )

    cfg = ImageEngineConfig(num_labels=5, vel_res=4.0, bias_res=8.0)
    shape = (12, 12, 12)
    rng = np.random.default_rng(0)
    lab = jnp.asarray(rng.integers(0, 5, size=shape, dtype=np.uint8))
    key = jax.random.PRNGKey(11)
    pd = jnp.dtype(cfg.integrate_payload_dtype)

    ref = labels_to_image_full(key, lab, cfg)

    svf = draw_svf_small(key, shape, cfg)
    assert svf is not None
    phi_small = integrate_svf(svf, cfg.int_steps, payload_dtype=pd)
    got = labels_to_image_full(key, lab, cfg, phi_small)

    for a, b, tol in zip(ref, got, (1e-5, 1e-5, 0, 1e-5, 1e-5)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), atol=tol)

    # the batched integrator must agree with the per-sample one
    phi_b = integrate_svf_batch(svf[None], cfg.int_steps, payload_dtype=pd)[0]
    np.testing.assert_allclose(np.asarray(phi_b), np.asarray(phi_small),
                               atol=1e-5)


class TestBlurModes:
    def test_shifts_matches_convolve(self):
        """The shift-based separable blur must equal the per-column convolve
        lowering (same zero-padded kernel; summation order differs -> fp32
        tolerance). Probed head-to-head on TPU by benchmarks/blur_probe.py."""
        from multimodal_registration_tpu.synth.image_engine import (
            _gaussian_blur_convolve,
            _gaussian_blur_shifts,
        )

        rng = np.random.default_rng(11)
        img = jnp.asarray(rng.normal(size=(13, 9, 17)).astype(np.float32))
        for sigma in (0.0, 0.4, 1.0):
            a = np.asarray(_gaussian_blur_convolve(img, jnp.float32(sigma), 3))
            b = np.asarray(_gaussian_blur_shifts(img, jnp.float32(sigma), 3))
            np.testing.assert_allclose(a, b, atol=2e-6, rtol=1e-5)

    def test_blur_mode_env_switch(self, monkeypatch):
        from multimodal_registration_tpu.synth.image_engine import _gaussian_blur

        rng = np.random.default_rng(12)
        img = jnp.asarray(rng.normal(size=(8, 8, 8)).astype(np.float32))
        monkeypatch.setenv("MMREG_BLUR_MODE", "convolve")
        a = np.asarray(_gaussian_blur(img, jnp.float32(0.8), 2))
        monkeypatch.setenv("MMREG_BLUR_MODE", "shifts")
        b = np.asarray(_gaussian_blur(img, jnp.float32(0.8), 2))
        np.testing.assert_allclose(a, b, atol=2e-6, rtol=1e-5)


class TestMultiScaleVelRes:
    """List-valued ``vel_res`` — the reference two-step recipe trains the
    smooth step-1 model with ``vel_res: [32, 64]`` (`README.md:157`), i.e.
    the generator SVF is a SUM of Perlin components, one per scale."""

    def test_engine_accepts_tuple_vel_res(self):
        from multimodal_registration_tpu.synth.image_engine import (
            ImageEngineConfig,
            labels_to_image,
        )

        cfg = ImageEngineConfig(
            num_labels=4, vel_res=(4.0, 8.0), bias_res=8.0, blur_radius=2
        )
        key = jax.random.PRNGKey(3)
        lab = jax.random.randint(jax.random.PRNGKey(9), (16, 16, 16), 0, 4)
        img, onehot = labels_to_image(key, lab, cfg)
        img, onehot = np.asarray(img), np.asarray(onehot)
        assert img.shape == (16, 16, 16)
        np.testing.assert_allclose(onehot.sum(-1), 1.0, atol=1e-5)
        # two-scale field differs from either single-scale draw
        one = np.asarray(
            labels_to_image(
                key, lab, synth.ImageEngineConfig(
                    num_labels=4, vel_res=4.0, bias_res=8.0, blur_radius=2
                )
            )[0]
        )
        assert np.abs(img - one).max() > 1e-4

    def test_draw_svf_small_matches_engine_keys(self):
        from multimodal_registration_tpu.ops.integrate import integrate_svf
        from multimodal_registration_tpu.synth.image_engine import (
            ImageEngineConfig,
            draw_svf_small,
            labels_to_image_full,
        )

        cfg = ImageEngineConfig(num_labels=3, vel_res=(4.0, 8.0), bias_res=8.0)
        shape = (12, 12, 12)
        lab = jnp.asarray(
            np.random.default_rng(1).integers(0, 3, size=shape, dtype=np.uint8)
        )
        key = jax.random.PRNGKey(5)
        ref = labels_to_image_full(key, lab, cfg)
        svf = draw_svf_small(key, shape, cfg)
        assert svf is not None
        phi_small = integrate_svf(
            svf, cfg.int_steps, payload_dtype=jnp.dtype(cfg.integrate_payload_dtype)
        )
        got = labels_to_image_full(key, lab, cfg, phi_small)
        np.testing.assert_allclose(
            np.asarray(ref[0]), np.asarray(got[0]), atol=1e-5
        )

    def test_train_config_list_vel_res_roundtrip(self):
        from multimodal_registration_tpu.train.config import TrainConfig
        from multimodal_registration_tpu.train.trainer import engine_config_from

        cfg = TrainConfig.from_dict({"vel_res": [32, 64]})
        ec = engine_config_from(cfg)
        assert ec.vel_res == (32, 64)
        hash(ec)  # frozen dataclass must stay hashable (jit-static arg)

    def test_engine_config_list_construction_is_hashable(self):
        from multimodal_registration_tpu.synth.image_engine import ImageEngineConfig

        ec = ImageEngineConfig(vel_res=[4.0, 8.0])
        assert ec.vel_res == (4.0, 8.0)
        hash(ec)  # __post_init__ tuple-izes at the config boundary
