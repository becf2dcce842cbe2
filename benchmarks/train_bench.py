"""SynthMorph training-step throughput at the reference workload
(`config/config.json`: 160×160×192 volumes, 26 labels, batch 1, enc/dec 64).

Measures the FULL fused step: on-device synthesis (two labels_to_image draws,
flips, zero-borders) + forward + Dice/Grad losses + backward + Adam. Chained
PRNG keys make steps data-dependent; a scalar readback drains the chain.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from multimodal_registration_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import jax
import numpy as np

from multimodal_registration_tpu.train.config import TrainConfig
from multimodal_registration_tpu.train.trainer import Trainer


def main(iters: int = 6, batch: int = 1, width: int = 0, blocks: int = 1):
    d = dict(
        in_shape=[160, 160, 192],
        num_labels=26,
        batch_size=batch,
        zero_borders_maps=True,  # exercise the full augmentation path
        epochs=1,
    )
    if width:  # e.g. 256 = the published inference widths (config_inference.json:8-9)
        d["enc"] = [width] * 4
        d["dec"] = [width] * 6
    cfg = TrainConfig.from_dict(d)
    trainer = Trainer(cfg)
    params, opt_state = trainer.init_state()
    rng = np.random.default_rng(0)
    bank = trainer.put_bank(
        rng.integers(0, 26, size=(4, 160, 160, 192), dtype=np.uint8)
    )
    si, ti = trainer.put_indices(
        rng.integers(0, 4, size=batch), rng.integers(0, 4, size=batch)
    )
    key = jax.random.PRNGKey(0)

    key, sub = jax.random.split(key)
    params, opt_state, aux = trainer.train_step_banked(params, opt_state, sub, bank, si, ti)
    _ = float(aux["loss"])  # compile + warmup + drain

    # best-of-blocks: a fresh-compile process carries inflated step times for
    # a while (PERF.md round 4b measurement trap); the best block is steady state
    best = None
    for b in range(blocks):
        t0 = time.time()
        for _ in range(iters):
            key, sub = jax.random.split(key)
            params, opt_state, aux = trainer.train_step_banked(
                params, opt_state, sub, bank, si, ti
            )
        loss = float(aux["loss"])  # drains the chain (params feed forward each step)
        dt = (time.time() - t0) / iters
        print(f"# block {b}: {dt:.3f} s/step", file=sys.stderr)
        best = dt if best is None else min(best, dt)
    dt = best
    print(
        json.dumps(
            {
                "metric": "synthmorph_train_steps_per_sec_160x160x192_b%d%s"
                % (batch, f"_w{width}" if width else ""),
                "value": round(1.0 / dt, 4),
                "unit": "steps/s",
                "sec_per_step": round(dt, 3),
                "final_loss": round(loss, 4),
            }
        )
    )


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--width", type=int, default=0,
                    help="override enc/dec widths (256 = published inference arch)")
    ap.add_argument("--blocks", type=int, default=1)
    a = ap.parse_args()
    main(iters=a.iters, batch=a.batch, width=a.width, blocks=a.blocks)
