"""Full-chain integration: train → checkpoint → inference CLI → evaluators.

The chain a real user runs (README quick start), at tiny scale on CPU.
"""

import csv
import json
import os

import numpy as np

from multimodal_registration_tpu.train.config import TrainConfig
from multimodal_registration_tpu.train.cli import run_training
from multimodal_registration_tpu.utils import nifti


def test_train_then_register_then_evaluate(tmp_path):
    # ---- 1. train a tiny model ----
    cfg = TrainConfig.from_dict(
        dict(
            in_shape=[16, 16, 16],
            num_labels=4,
            num_maps=4,
            im_scales=[4],
            def_scales=[4],
            epochs=2,
            batch_size=2,
            batch_size_val=1,
            save_freq=2,
            vel_res=4.0,
            bias_res=8.0,
            enc=[4, 4, 4, 4],
            dec=[4, 4, 4, 4, 4, 4],
            model_dir=str(tmp_path / "models"),
            log_dir=str(tmp_path / "logs"),
            label_dir=str(tmp_path / "labels"),
            save_label=True,
            compute_dtype="float32",
        )
    )
    out = run_training(cfg)
    assert out["steps"] > 0
    ckpt_npz = os.path.join(cfg.model_dir, "final.npz")
    assert os.path.exists(ckpt_npz)
    # label maps were saved with the reference naming (train_synthmorph.py:77)
    assert os.path.exists(os.path.join(cfg.label_dir, "label_map_26lab_1.nii.gz"))

    # ---- 2. register a synthetic pair through the standalone CLI ----
    from multimodal_registration_tpu.infer.cli import pair_registration

    rng = np.random.default_rng(0)
    g = np.stack(np.meshgrid(*[np.linspace(-1, 1, 20)] * 3, indexing="ij"))
    blob = np.exp(-(g**2).sum(0) * 4).astype(np.float32)
    fx = str(tmp_path / "fx.nii.gz")
    mov = str(tmp_path / "mov.nii.gz")
    nifti.save(nifti.NiftiImage(blob + 0.05 * rng.random(blob.shape, dtype=np.float32), np.eye(4)), fx)
    nifti.save(nifti.NiftiImage(np.roll(blob, 2, 0) + 0.05 * rng.random(blob.shape, dtype=np.float32), np.eye(4)), mov)
    inf_cfg = str(tmp_path / "cfg_inf.json")
    with open(inf_cfg, "w") as f:
        json.dump(dict(enc=[4] * 4, dec=[4] * 6, compute_dtype="float32"), f)

    res = pair_registration(
        [
            "--model-path", ckpt_npz,
            "--config-path", inf_cfg,
            "--fx-img-path", fx,
            "--mov-img-path", mov,
            "--res-dir", str(tmp_path / "res"),
        ]
    )
    warped = str(tmp_path / "res" / "warped_im.nii.gz")
    field = str(tmp_path / "res" / "deform_field.nii.gz")
    assert os.path.exists(warped) and os.path.exists(field)

    # ---- 2b. the orbax checkpoint dir also loads ----
    from multimodal_registration_tpu.infer.config import InferenceConfig
    from multimodal_registration_tpu.infer.register import load_params_any

    params = load_params_any(os.path.join(cfg.model_dir, "final"), InferenceConfig.from_json(inf_cfg))
    assert params is not None

    # ---- 3. evaluators on the outputs ----
    from multimodal_registration_tpu.evalx.cli import eval_with_jacobian, eval_with_mi

    rc = eval_with_mi(
        [
            "--fx-im-path", fx, "--moving-im-path", mov, "--warped-im-path", warped,
            "--sub-id", "it", "--out-file", str(tmp_path / "nmi.csv"),
        ]
    )
    assert rc == 0
    rc = eval_with_jacobian(
        [
            "--def-field-path", field, "--sub-id", "it",
            "--out-file", str(tmp_path / "jac.csv"),
            "--out-im-path", str(tmp_path / "detJa.nii.gz"),
        ]
    )
    assert rc == 0
    rows = list(csv.reader(open(tmp_path / "jac.csv")))
    pct_neg = float(rows[1][2])
    assert pct_neg < 5.0  # diffeomorphic integration keeps folding ≈ 0
