"""Training CLI — drop-in equivalent of ``train_synthmorph.py``
(`train_synthmorph.py:168-344`; invocation `README.md:77`):

    python train_synthmorph.py --config-path config/config.json

Flow parity: load config → device setup + batch divisibility assert → generate
or load label maps → seeded shuffle + train/val split → build models/losses →
checkpoint callbacks → fit loop with initial-epoch resume.
"""

from __future__ import annotations

import argparse
import csv
import os
import time

import jax
import numpy as np

from multimodal_registration_tpu.synth.labelmaps import generate_label_maps
from multimodal_registration_tpu.train.config import TrainConfig
from multimodal_registration_tpu.train.trainer import Trainer
from multimodal_registration_tpu.utils import io as vio
from multimodal_registration_tpu.utils import nifti


def run_training(cfg: TrainConfig, max_steps: int | None = None) -> dict:
    """Full training flow; returns summary metrics (for tests/benchmarks)."""
    if cfg.num_devices is not None:
        assert cfg.batch_size % cfg.num_devices == 0, (
            f"batch size {cfg.batch_size} not a multiple of the number of devices "
            f"{cfg.num_devices}"  # parity: train_synthmorph.py:193-194
        )

    # ---- label maps (train_synthmorph.py:201-207) --------------------------
    rng_gen = jax.random.PRNGKey(cfg.seed)
    if cfg.gen_label:
        label_maps = generate_label_maps(
            rng_gen,
            cfg.num_maps,
            cfg.in_shape,
            cfg.num_labels,
            im_scales=cfg.im_scales,
            def_scales=cfg.def_scales,
            im_max_std=cfg.im_max_std,
            def_max_std=cfg.def_max_std,
        )
        if cfg.save_label:
            os.makedirs(cfg.label_dir, exist_ok=True)
            # 3-D maps → .nii.gz, 2-D maps → .png (train_synthmorph.py:71-80)
            if len(cfg.in_shape) == 3:
                for i, m in enumerate(label_maps):
                    nifti.save(
                        nifti.NiftiImage(m, np.eye(4)),
                        os.path.join(cfg.label_dir, f"label_map_{cfg.add_str}{i + 1}.nii.gz"),
                    )
            else:
                import matplotlib

                matplotlib.use("Agg")
                import matplotlib.pyplot as plt

                for i, m in enumerate(label_maps):
                    plt.imsave(
                        os.path.join(cfg.label_dir, f"label_map_{cfg.add_str}{i + 1}.png"), m
                    )
        labels_in = np.unique(np.stack(label_maps))
    else:
        labels_in, label_maps = vio.load_labels(cfg.label_dir)
        # The synthesis engine one-hots by POSITION (values must live in
        # [0, num_labels)); the reference instead passes the raw value list
        # as in_label_list (`train_synthmorph.py:205-260`). Same semantics:
        # remap raw label values (e.g. FreeSurfer ids 0,2,41,...) to
        # contiguous indices, and size the engine to the actual label count.
        labels_in = np.asarray(labels_in)
        if (labels_in.min() != 0 or labels_in.max() != len(labels_in) - 1):
            lut = np.zeros(int(labels_in.max()) + 1, np.int32)
            lut[labels_in.astype(np.int64)] = np.arange(len(labels_in), dtype=np.int32)
            label_maps = [lut[np.asarray(m, np.int64)] for m in label_maps]
        if len(labels_in) != cfg.num_labels:
            print(
                f"loaded maps have {len(labels_in)} distinct labels; "
                f"overriding num_labels={cfg.num_labels}"
            )
            cfg.num_labels = int(len(labels_in))

    # seeded shuffle + split (train_synthmorph.py:209-211)
    np.random.seed(42)
    label_maps = list(label_maps)
    np.random.shuffle(label_maps)
    n_tr = int(len(label_maps) * cfg.train_frac)
    maps_tr, maps_val = label_maps[:n_tr], label_maps[n_tr:]

    if cfg.gen_label_only:
        return {"label_maps": len(label_maps)}

    # ---- dirs (train_synthmorph.py:244-251) --------------------------------
    model_dir = cfg.model_dir
    log_dir = cfg.log_dir
    if cfg.bool_sub_dir:
        model_dir = os.path.join(model_dir, cfg.sub_dir)
        if log_dir:
            log_dir = os.path.join(log_dir, cfg.sub_dir)
    os.makedirs(model_dir, exist_ok=True)
    if log_dir:
        os.makedirs(log_dir, exist_ok=True)

    # ---- trainer -----------------------------------------------------------
    trainer = Trainer(cfg)
    params, opt_state = trainer.init_state()
    init_epoch = cfg.init_epoch
    if cfg.bool_init_weights:
        params, loaded_opt, _ = trainer.load_checkpoint(cfg.init_weights, with_opt=True)
        if loaded_opt is not None:
            opt_state = loaded_opt

    # epoch-0 snapshot always saved pre-fit (train_synthmorph.py:334)
    trainer.save_checkpoint(
        os.path.join(model_dir, f"{init_epoch:04d}"), params, opt_state, init_epoch
    )

    bank_tr = trainer.put_bank(np.stack(maps_tr).astype(np.uint8))
    bank_val = trainer.put_bank(np.stack(maps_val).astype(np.uint8)) if maps_val else None

    steps_per_epoch = max(len(maps_tr) // cfg.batch_size, 1)
    val_steps = (len(maps_val) // cfg.batch_size_val) if maps_val else 0
    rng = np.random.default_rng(cfg.seed)
    key = jax.random.PRNGKey(cfg.seed + 1)

    metrics_path = os.path.join(log_dir or model_dir, "metrics.csv")
    new_file = not os.path.exists(metrics_path)
    metrics_f = open(metrics_path, "a", newline="")
    writer = csv.writer(metrics_f)
    if new_file:
        writer.writerow(["epoch", "loss", "dice_loss", "grad_loss", "val_loss", "sec_per_step"])

    # optional TensorBoard scalars (reference parity: train_synthmorph.py:320-325);
    # opt-in via MMREG_TENSORBOARD=1 because importing TF is slow
    tb_writer = None
    if log_dir and os.environ.get("MMREG_TENSORBOARD") == "1":
        try:
            import tensorflow as tf  # present in some environments; optional

            tb_writer = tf.summary.create_file_writer(log_dir)
        except Exception:
            tb_writer = None

    history = []
    total_steps = 0
    for epoch in range(init_epoch, cfg.epochs):
        t0 = time.time()
        ep_losses = []
        for _ in range(steps_per_epoch):
            idx = rng.integers(len(maps_tr), size=2 * cfg.batch_size)
            src_idx = idx[: cfg.batch_size]
            trg_idx = src_idx if cfg.same_subj else idx[cfg.batch_size :]
            key, sub = jax.random.split(key)
            si, ti = trainer.put_indices(src_idx, trg_idx)
            params, opt_state, aux = trainer.train_step_banked(
                params, opt_state, sub, bank_tr, si, ti
            )
            ep_losses.append(float(aux["loss"]))
            total_steps += 1
            if max_steps is not None and total_steps >= max_steps:
                break

        val_losses = []
        for _ in range(val_steps):
            idx = rng.integers(len(maps_val), size=2 * cfg.batch_size_val)
            s_idx = idx[: cfg.batch_size_val]
            t_idx = s_idx if cfg.same_subj else idx[cfg.batch_size_val :]
            key, sub = jax.random.split(key)
            si, ti = trainer.put_indices(s_idx, t_idx)
            aux = trainer.val_step_banked(params, sub, bank_val, si, ti)
            val_losses.append(float(aux["loss"]))

        sec_per_step = (time.time() - t0) / max(len(ep_losses), 1)
        row = dict(
            epoch=epoch + 1,
            loss=float(np.mean(ep_losses)) if ep_losses else float("nan"),
            dice_loss=float(aux["dice_loss"]),
            grad_loss=float(aux["grad_loss"]),
            val_loss=float(np.mean(val_losses)) if val_losses else float("nan"),
            sec_per_step=sec_per_step,
        )
        history.append(row)
        writer.writerow(list(row.values()))
        metrics_f.flush()
        if tb_writer is not None:
            import tensorflow as tf

            with tb_writer.as_default():
                for k in ("loss", "dice_loss", "grad_loss", "val_loss"):
                    tf.summary.scalar(k, row[k], step=epoch + 1)
        if cfg.verbose:
            print(
                f"epoch {epoch + 1}/{cfg.epochs} loss={row['loss']:.4f} "
                f"val={row['val_loss']:.4f} ({sec_per_step:.2f}s/step)",
                flush=True,
            )

        if (epoch + 1) % cfg.save_freq == 0 or (epoch + 1) == cfg.epochs:
            trainer.save_checkpoint(
                os.path.join(model_dir, f"{epoch + 1:04d}"), params, opt_state, epoch + 1
            )
        if max_steps is not None and total_steps >= max_steps:
            break

    metrics_f.close()
    trainer.save_checkpoint(os.path.join(model_dir, "final"), params, opt_state, cfg.epochs)
    return {"history": history, "params": params, "steps": total_steps}


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Train a SynthMorph model on images synthesized from label maps (TPU-native)."
    )
    p.add_argument("--config-path", default="config/config.json")
    p.add_argument("--max-steps", type=int, default=None, help="optional step cap (debug)")
    arg = p.parse_args(argv)
    cfg = TrainConfig.from_json(arg.config_path)
    run_training(cfg, max_steps=arg.max_steps)


if __name__ == "__main__":
    main()
