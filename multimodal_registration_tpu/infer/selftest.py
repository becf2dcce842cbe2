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
