"""End-to-end training smoke tests (tiny shapes, CPU mesh)."""

import json
import os

import numpy as np
import pytest

import jax

from multimodal_registration_tpu.train.config import TrainConfig
from multimodal_registration_tpu.train.cli import run_training
from multimodal_registration_tpu.train.trainer import Trainer


def tiny_cfg(tmp_path, **overrides):
    base = dict(
        in_shape=[16, 16, 16],
        num_labels=4,
        num_maps=6,
        im_scales=[4, 8],
        def_scales=[4],
        epochs=2,
        batch_size=2,
        batch_size_val=1,
        save_freq=1,
        vel_res=4.0,
        bias_res=8.0,
        enc=[4, 4, 4, 4],
        dec=[4, 4, 4, 4, 4, 4],
        model_dir=str(tmp_path / "models"),
        log_dir=str(tmp_path / "logs"),
        label_dir=str(tmp_path / "labels"),
        save_label=False,
        compute_dtype="float32",
        lr=1e-3,
    )
    base.update(overrides)
    return TrainConfig.from_dict(base)


def test_smoke_train_loss_decreases(tmp_path):
    cfg = tiny_cfg(tmp_path, epochs=6)
    out = run_training(cfg)
    hist = out["history"]
    assert len(hist) == 6
    first, last = hist[0]["loss"], hist[-1]["loss"]
    assert np.isfinite(first) and np.isfinite(last)
    # loss = -dice + 1 + reg: must improve on average over 6 tiny epochs
    assert last < first


def test_checkpoint_roundtrip(tmp_path):
    cfg = tiny_cfg(tmp_path, epochs=1)
    out = run_training(cfg)
    trainer = Trainer(cfg)
    ckpt = os.path.join(cfg.model_dir, "final")
    params, _, epoch = trainer.load_checkpoint(ckpt)
    a = jax.tree_util.tree_leaves(out["params"])
    b = jax.tree_util.tree_leaves(params)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)
    # npz flat export exists too
    assert os.path.exists(ckpt + ".npz")


def test_npz_warm_start(tmp_path):
    cfg = tiny_cfg(tmp_path, epochs=1)
    out = run_training(cfg)
    ckpt = os.path.join(cfg.model_dir, "final.npz")
    cfg2 = tiny_cfg(tmp_path, epochs=1, bool_init_weights=True, init_weights=ckpt,
                    model_dir=str(tmp_path / "m2"))
    out2 = run_training(cfg2)
    assert len(out2["history"]) == 1


def test_zero_border_training_path(tmp_path):
    cfg = tiny_cfg(tmp_path, epochs=1, zero_borders_maps=True)
    out = run_training(cfg)
    assert np.isfinite(out["history"][0]["loss"])


def test_dp_sharding_over_virtual_mesh(tmp_path):
    """Train step sharded over all 8 virtual CPU devices."""
    assert len(jax.devices()) == 8
    cfg = tiny_cfg(tmp_path, epochs=1, batch_size=8, num_maps=8)
    out = run_training(cfg)
    assert np.isfinite(out["history"][0]["loss"])


def test_dp_step_equals_single_device_step(tmp_path):
    """Equality theorem (VERDICT round-1 item 4): one data-parallel train step
    over the 8-device mesh must produce the SAME loss and params as the same
    step on 1 device — a sharding bug that scrambles batch elements or
    mis-reduces gradients fails this, not just non-finiteness."""
    assert len(jax.devices()) == 8
    cfg = tiny_cfg(tmp_path, epochs=1, batch_size=8, num_maps=8)
    rng = np.random.default_rng(0)
    maps = rng.integers(0, cfg.num_labels, size=(8, 16, 16, 16), dtype=np.uint8)
    key = jax.random.PRNGKey(123)

    results = {}
    for n_dev in (1, 8):
        cfg_n = tiny_cfg(tmp_path, epochs=1, batch_size=8, num_maps=8,
                         num_devices=n_dev)
        trainer = Trainer(cfg_n)
        assert trainer.mesh.shape["data"] * trainer.mesh.shape.get("space", 1) == n_dev
        params, opt_state = trainer.init_state(seed=7)
        src, trg = trainer.put_batch(maps.copy(), maps.copy())
        params, opt_state, aux = trainer.train_step(params, opt_state, key, src, trg)
        results[n_dev] = (jax.device_get(params), float(aux["loss"]))

    np.testing.assert_allclose(results[1][1], results[8][1], rtol=1e-5, atol=1e-6)
    flat1 = jax.tree_util.tree_leaves(results[1][0])
    flat8 = jax.tree_util.tree_leaves(results[8][0])
    assert len(flat1) == len(flat8)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=2e-5)


def test_compose_payload_dtype_deviation(tmp_path):
    """bf16 gather payload for the loss's composed-field warp must stay
    within ~0.05 voxels of the f32 path (the policy threshold measured for
    integrate_payload_dtype in PERF.md)."""
    import jax.numpy as jnp

    from multimodal_registration_tpu.ops.field import compose_fields_batch

    rng = np.random.default_rng(0)
    phi1 = jnp.asarray(rng.normal(scale=3.0, size=(1, 16, 16, 16, 3)).astype(np.float32))
    phi2 = jnp.asarray(rng.normal(scale=2.0, size=(1, 16, 16, 16, 3)).astype(np.float32))
    f32 = np.asarray(compose_fields_batch(phi1, phi2))
    b16 = np.asarray(
        compose_fields_batch(phi1.astype(jnp.bfloat16), phi2).astype(jnp.float32)
    )
    assert np.max(np.abs(f32 - b16)) < 0.05


def test_compose_res_half_matches_full(tmp_path):
    """compose_res=2 (small-grid compose + one upsample) must track the
    full-res compose closely: both interpolate the same two half-res fields,
    differing only at second order (interpolating composed samples vs
    composing interpolants). Loss values must agree to ~1e-2 and gradients
    must stay aligned — this bounds the approximation the default ships."""
    import jax.numpy as jnp

    from multimodal_registration_tpu.train.trainer import (
        engine_config_from,
        make_loss_fn,
        vxm_config_from,
    )
    from multimodal_registration_tpu.models.vxm_dense import VxmDense

    rng = np.random.default_rng(3)
    maps = rng.integers(0, 4, size=(2, 16, 16, 16), dtype=np.uint8)
    src = jnp.asarray(maps)
    trg = jnp.asarray(maps[::-1].copy())
    key = jax.random.PRNGKey(5)

    losses, grads = {}, {}
    for res in (1, 2):
        cfg = tiny_cfg(tmp_path, compose_res=res, compose_payload_dtype="")
        model = VxmDense(cfg=vxm_config_from(cfg))
        dummy = jnp.zeros((1, 16, 16, 16, 1), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), dummy, dummy)
        loss_fn = make_loss_fn(model, engine_config_from(cfg), cfg, False)
        (loss, _), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params, key, src, trg
        )
        losses[res] = float(loss)
        grads[res] = np.concatenate(
            [np.asarray(l).ravel() for l in jax.tree_util.tree_leaves(g)]
        )

    assert abs(losses[1] - losses[2]) < 1e-2, losses
    # gradient direction must agree (cosine similarity)
    cos = float(
        np.dot(grads[1], grads[2])
        / (np.linalg.norm(grads[1]) * np.linalg.norm(grads[2]) + 1e-12)
    )
    assert cos > 0.99, cos


def test_svf_int_res4_compose_bridge_matches_full(tmp_path):
    """svf_int_res=4 (generator SVF integrated at the quarter grid) with
    compose_res=2: the generator grid is a uniform 2x coarsening of the
    model's int-res warp grid, so the loss must take the BRIDGED small-grid
    compose (one /4->/2 upsample + /2 compose) and track the full-res
    compose fallback of the SAME fields to the usual second-order bound."""
    import jax.numpy as jnp

    from multimodal_registration_tpu.models.vxm_dense import VxmDense
    from multimodal_registration_tpu.train.trainer import (
        engine_config_from,
        make_loss_fn,
        vxm_config_from,
    )

    rng = np.random.default_rng(7)
    maps = rng.integers(0, 4, size=(2, 16, 16, 16), dtype=np.uint8)
    src = jnp.asarray(maps)
    trg = jnp.asarray(maps[::-1].copy())
    key = jax.random.PRNGKey(9)

    losses, grads = {}, {}
    for res in (1, 2):
        cfg = tiny_cfg(tmp_path, compose_res=res, compose_payload_dtype="",
                       svf_int_res=4)
        model = VxmDense(cfg=vxm_config_from(cfg))
        dummy = jnp.zeros((1, 16, 16, 16, 1), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), dummy, dummy)
        loss_fn = make_loss_fn(model, engine_config_from(cfg), cfg, False)
        (loss, _), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params, key, src, trg
        )
        losses[res] = float(loss)
        grads[res] = np.concatenate(
            [np.asarray(l).ravel() for l in jax.tree_util.tree_leaves(g)]
        )

    assert np.isfinite(losses[2]), losses
    assert abs(losses[1] - losses[2]) < 1e-2, losses
    cos = float(
        np.dot(grads[1], grads[2])
        / (np.linalg.norm(grads[1]) * np.linalg.norm(grads[2]) + 1e-12)
    )
    assert cos > 0.99, cos


def test_grad_res2_tracks_fullres_grad(tmp_path):
    """grad_res=2 (smoothness penalty on the int-res warp) must track the
    full-res penalty up to the fixed boundary-term ratio (~1.056 on smooth
    fields — train/config.py): same loss to ~1e-2, aligned gradients."""
    import jax.numpy as jnp

    from multimodal_registration_tpu.models.vxm_dense import VxmDense
    from multimodal_registration_tpu.train.trainer import (
        engine_config_from,
        make_loss_fn,
        vxm_config_from,
    )

    rng = np.random.default_rng(13)
    maps = rng.integers(0, 4, size=(2, 16, 16, 16), dtype=np.uint8)
    src = jnp.asarray(maps)
    trg = jnp.asarray(maps[::-1].copy())
    key = jax.random.PRNGKey(21)

    losses, grads = {}, {}
    for res in (1, 2):
        cfg = tiny_cfg(tmp_path, grad_res=res, reg_param=1.0)
        model = VxmDense(cfg=vxm_config_from(cfg))
        dummy = jnp.zeros((1, 16, 16, 16, 1), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), dummy, dummy)
        loss_fn = make_loss_fn(model, engine_config_from(cfg), cfg, False)
        (loss, _), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params, key, src, trg
        )
        losses[res] = float(loss)
        grads[res] = np.concatenate(
            [np.asarray(l).ravel() for l in jax.tree_util.tree_leaves(g)]
        )

    assert abs(losses[1] - losses[2]) < 1e-2, losses
    cos = float(
        np.dot(grads[1], grads[2])
        / (np.linalg.norm(grads[1]) * np.linalg.norm(grads[2]) + 1e-12)
    )
    assert cos > 0.99, cos


def test_svf_int_res4_train_step_runs(tmp_path):
    """A fused train step with the quarter-grid generator integration must
    run end to end (the trainer's batched pre-draw + the bridged compose)."""
    from multimodal_registration_tpu.train.trainer import Trainer

    cfg = tiny_cfg(tmp_path, svf_int_res=4)
    trainer = Trainer(cfg)
    params, opt_state = trainer.init_state()
    rng = np.random.default_rng(1)
    maps = rng.integers(0, 4, size=(2, 16, 16, 16), dtype=np.uint8)
    src, trg = trainer.put_batch(maps, maps.copy())
    key = jax.random.PRNGKey(3)
    params, opt_state, aux = trainer.train_step(params, opt_state, key, src, trg)
    assert np.isfinite(float(aux["loss"]))


def test_loaded_noncontiguous_labels_are_remapped(tmp_path):
    """gen_label=false with raw label VALUES (e.g. FreeSurfer ids): the cli
    must remap to contiguous [0, L) and size the engine to the real count
    (reference: in_label_list, `train_synthmorph.py:205-260`)."""
    from multimodal_registration_tpu.utils import nifti

    lab_dir = tmp_path / "loaded_labels"
    lab_dir.mkdir()
    rng = np.random.default_rng(0)
    values = np.array([0, 3, 7, 200], np.uint8)
    for i in range(4):
        m = values[rng.integers(0, 4, size=(16, 16, 16))]
        nifti.save(nifti.NiftiImage(m.astype(np.float32), np.eye(4)),
                   str(lab_dir / f"map_{i}.nii.gz"))
    cfg = tiny_cfg(tmp_path, epochs=1, gen_label=False,
                   label_dir=str(lab_dir), num_labels=26)  # wrong on purpose
    out = run_training(cfg)
    assert cfg.num_labels == 4  # overridden to the actual count
    assert np.isfinite(out["history"][-1]["loss"])


def test_vel_res_list_train_step_runs(tmp_path):
    """A fused train step with the two-step recipe's list-valued vel_res
    (smooth step-1 model, `README.md:157`) must run end to end through the
    trainer's batched generator-SVF pre-draw."""
    cfg = tiny_cfg(tmp_path, vel_res=[8, 16])
    trainer = Trainer(cfg)
    params, opt_state = trainer.init_state()
    rng = np.random.default_rng(2)
    maps = rng.integers(0, 4, size=(2, 16, 16, 16), dtype=np.uint8)
    src, trg = trainer.put_batch(maps, maps.copy())
    key = jax.random.PRNGKey(4)
    params, opt_state, aux = trainer.train_step(params, opt_state, key, src, trg)
    assert np.isfinite(float(aux["loss"]))
