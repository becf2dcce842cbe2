"""Self-contained consistency checks for the user-facing inference surface.

Shared by the driver contract check (``__graft_entry__.dryrun_multichip``) and
the test suite (`tests/test_parallel.py`) so the sharded-CLI parity assertion
lives in exactly one place (parity target: the reference's subvolume-mode
config flag, `config_inference.json:2-4`).
"""

from __future__ import annotations

import json
import os

import numpy as np


def cli_space_parity_check(space: int, workdir: str, seed: int = 0,
                           atol: float = 2e-4) -> None:
    """Drive ``pair_registration`` twice — unsharded and ``space``-sharded —
    on a synthetic pair and assert bit-close NIfTI outputs.

    Requires ``space * 16`` to divide the volume X dim (guaranteed here) and
    at least ``space`` visible JAX devices. Raises ``AssertionError`` on any
    mismatch; cleans nothing up (callers own ``workdir``).
    """
    import jax

    from multimodal_registration_tpu.infer.cli import pair_registration
    from multimodal_registration_tpu.models.vxm_dense import (
        VxmConfig,
        params_template,
    )
    from multimodal_registration_tpu.train.trainer import _flatten_params
    from multimodal_registration_tpu.utils import nifti

    rng = np.random.default_rng(seed)
    aff = np.eye(4)
    shape = (32 * space, 16, 16)
    fx_p = os.path.join(workdir, "fx.nii.gz")
    mov_p = os.path.join(workdir, "mov.nii.gz")
    nifti.save(nifti.NiftiImage(rng.random(shape).astype(np.float32), aff), fx_p)
    nifti.save(nifti.NiftiImage(rng.random(shape).astype(np.float32), aff), mov_p)

    params = params_template(
        VxmConfig(enc=(4,) * 4, dec=(4,) * 6, compute_dtype="float32")
    )
    params = jax.tree_util.tree_map(
        lambda x: np.asarray(rng.normal(scale=0.05, size=x.shape), x.dtype), params
    )
    wpath = os.path.join(workdir, "w.npz")
    np.savez(wpath, **_flatten_params(params))

    outs = {}
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        for tag, extra in (
            ("single", {}),
            ("sharded", {"sharding": {"space": space}}),
        ):
            cfg_p = os.path.join(workdir, f"cfg_{tag}.json")
            with open(cfg_p, "w") as f:
                json.dump(
                    dict(enc=[4] * 4, dec=[4] * 6, compute_dtype="float32",
                         **extra), f)
            res_dir = os.path.join(workdir, f"res_{tag}")
            pair_registration([
                "--model-path", wpath, "--config-path", cfg_p,
                "--fx-img-path", fx_p, "--mov-img-path", mov_p,
                "--fx-img-contrast", "T2w", "--res-dir", res_dir,
                "--one-cpu-tf", "False",
            ])
            outs[tag] = (
                nifti.load(os.path.join(res_dir, "warped_im.nii.gz")).get_fdata(),
                nifti.load(os.path.join(res_dir, "deform_field.nii.gz")).get_fdata(),
            )
    finally:
        os.chdir(cwd)
    np.testing.assert_allclose(outs["sharded"][0], outs["single"][0], atol=atol,
                               err_msg="sharded CLI moved != single-chip")
    np.testing.assert_allclose(outs["sharded"][1], outs["single"][1], atol=atol,
                               err_msg="sharded CLI field != single-chip")


def cli_cascade_space_parity_check(space: int, workdir: str, seed: int = 0,
                                   atol: float = 2e-4) -> None:
    """Drive the two-step cascade CLI (``bids_two_steps``) unsharded and
    ``space``-sharded on a synthetic pair and assert matching NIfTI outputs.

    Exercises two sharded registrars + the dense-field compose + shared
    postprocess on the mesh (parity target:
    `bids_two_steps_registration.py:274-546`)."""
    import jax

    from multimodal_registration_tpu.infer.cli import bids_two_steps
    from multimodal_registration_tpu.models.vxm_dense import (
        VxmConfig,
        params_template,
    )
    from multimodal_registration_tpu.train.trainer import _flatten_params
    from multimodal_registration_tpu.utils import nifti

    rng = np.random.default_rng(seed)
    aff = np.eye(4)
    shape = (32 * space, 16, 16)
    fx_data = rng.random(shape).astype(np.float32)
    mov_data = rng.random(shape).astype(np.float32)

    template = params_template(
        VxmConfig(enc=(4,) * 4, dec=(4,) * 6, compute_dtype="float32")
    )
    wpaths = []
    for i in range(2):  # two DIFFERENT models — a real cascade, not m∘m
        params = jax.tree_util.tree_map(
            lambda x: np.asarray(rng.normal(scale=0.05, size=x.shape), x.dtype),
            template,
        )
        wp = os.path.join(workdir, f"w{i + 1}.npz")
        np.savez(wp, **_flatten_params(params))
        wpaths.append(wp)

    outs = {}
    cwd = os.getcwd()
    try:
        for tag, extra in (
            ("single", {}),
            ("sharded", {"sharding": {"space": space}}),
        ):
            d = os.path.join(workdir, f"casc_{tag}")
            os.makedirs(d, exist_ok=True)
            fx_p = os.path.join(d, "fx.nii.gz")
            mov_p = os.path.join(d, "mov.nii.gz")
            nifti.save(nifti.NiftiImage(fx_data, aff), fx_p)
            nifti.save(nifti.NiftiImage(mov_data, aff), mov_p)
            cfg_p = os.path.join(d, "cfg.json")
            with open(cfg_p, "w") as f:
                json.dump(
                    dict(enc=[4] * 4, dec=[4] * 6, compute_dtype="float32",
                         **extra), f)
            os.chdir(d)
            bids_two_steps([
                "--model1-path", wpaths[0], "--model2-path", wpaths[1],
                "--config-path", cfg_p,
                "--fx-img-path", fx_p, "--mov-img-path", mov_p,
                "--fx-img-contrast", "T2w", "--one-cpu-tf", "False",
            ])
            os.chdir(cwd)
            outs[tag] = (
                nifti.load(os.path.join(d, "mov_reg_original_dim.nii.gz")).get_fdata(),
                nifti.load(os.path.join(d, "mov_warp_original_dim.nii.gz")).get_fdata(),
            )
    finally:
        os.chdir(cwd)
    np.testing.assert_allclose(outs["sharded"][0], outs["single"][0], atol=atol,
                               err_msg="sharded cascade moved != single-chip")
    np.testing.assert_allclose(outs["sharded"][1], outs["single"][1], atol=atol,
                               err_msg="sharded cascade field != single-chip")


def int8_sharded_forward_check(space: int, atol: float = 2e-5) -> None:
    """Quantized (int8) forward, space-sharded vs single-device, on random
    input — int32 conv accumulation is exact, so the sharded quantized
    forward must equal the unsharded one (mirror of
    tests/test_quantize.py::test_sharded_matches_single_device, recorded here
    so the driver-visible dryrun carries the assertion)."""
    from multimodal_registration_tpu.infer.config import InferenceConfig
    from multimodal_registration_tpu.infer.register import Registrar
    from multimodal_registration_tpu.infer.sharded import ShardedRegistrar
    from multimodal_registration_tpu.models.vxm_dense import VxmConfig, init_params
    from multimodal_registration_tpu.parallel.mesh import make_mesh

    cfg = InferenceConfig.from_dict(dict(
        enc=[64, 64], dec=[64, 64, 64, 64], int_steps=3,
        compute_dtype="float32", quantize="int8",
    ))
    vxm = VxmConfig(enc=(64, 64), dec=(64, 64, 64, 64), int_steps=3,
                    compute_dtype="float32")
    rng = np.random.default_rng(13)
    params = init_params(vxm, inshape=(16, 16, 16), seed=0)
    import jax

    params = jax.tree_util.tree_map(
        lambda a: np.asarray(rng.normal(0, 0.02, a.shape), a.dtype)
        if a.ndim > 1 else a,
        params,
    )
    mov = rng.random((1, 16 * space, 16, 16), dtype=np.float64).astype(np.float32)
    fx = rng.random((1, 16 * space, 16, 16), dtype=np.float64).astype(np.float32)

    sharded = ShardedRegistrar(cfg, params, make_mesh(space, space=space))
    m1, w1 = sharded.predict(mov, fx)
    m2, w2 = Registrar(cfg, params).predict(mov, fx)
    np.testing.assert_allclose(
        w1, w2, atol=atol,
        err_msg="int8 space-sharded field != single-device field")
    np.testing.assert_allclose(
        m1, m2, atol=atol,
        err_msg="int8 space-sharded moved != single-device moved")
