"""TF-CPU baseline measurement.

The reference stack is TensorFlow/Keras (`train_synthmorph.py:22`) running the
VoxelMorph VxmDense network; the repo publishes no numbers (BASELINE.md), so we
*establish* the baseline by timing a faithful Keras re-implementation of the
same forward computation (U-Net enc [64]x4 / dec [64]x6 on concat(mov, fx),
SVF at half res, 5-step scaling-and-squaring, trilinear warps) on CPU — the
hardware the reference pipelines run on (SCT environments are CPU-only,
`bids_registration.py:469-472`).

Not a copy of voxelmorph: written from the architecture contract for timing
purposes only.
"""

from __future__ import annotations

import time

import numpy as np


def build_tf_forward(shape, enc=(64, 64, 64, 64), dec=(64, 64, 64, 64, 64, 64)):
    import tensorflow as tf

    def trilinear_warp(vol, flow):
        # vol (B,X,Y,Z,C), flow (B,X,Y,Z,3); edge-clamped trilinear gather
        sh = tf.shape(vol)
        X, Y, Z = vol.shape[1], vol.shape[2], vol.shape[3]
        grid = tf.stack(
            tf.meshgrid(
                tf.range(X, dtype=tf.float32),
                tf.range(Y, dtype=tf.float32),
                tf.range(Z, dtype=tf.float32),
                indexing="ij",
            ),
            axis=-1,
        )
        loc = grid[None] + flow
        maxs = tf.constant([X - 1, Y - 1, Z - 1], tf.float32)
        loc = tf.clip_by_value(loc, 0.0, maxs)
        loc0 = tf.floor(loc)
        w1 = loc - loc0
        i0 = tf.cast(loc0, tf.int32)
        i1 = tf.minimum(i0 + 1, tf.cast(maxs, tf.int32))
        out = 0.0
        for dx in (0, 1):
            wx = w1[..., 0] if dx else 1.0 - w1[..., 0]
            ix = i1[..., 0] if dx else i0[..., 0]
            for dy in (0, 1):
                wy = w1[..., 1] if dy else 1.0 - w1[..., 1]
                iy = i1[..., 1] if dy else i0[..., 1]
                for dz in (0, 1):
                    wz = w1[..., 2] if dz else 1.0 - w1[..., 2]
                    iz = i1[..., 2] if dz else i0[..., 2]
                    idx = tf.stack([ix, iy, iz], -1)
                    corner = tf.gather_nd(vol, idx, batch_dims=1)
                    out = out + corner * (wx * wy * wz)[..., None]
        return out

    def resize2x(flow):
        # nearest-neighbour 2x upsample + vector scale (cheap stand-in for the
        # linear rescale; negligible fraction of total time)
        f = tf.keras.layers.UpSampling3D(2)(flow)
        return f * 2.0

    KL = tf.keras.layers
    mov = tf.keras.Input(shape=(*shape, 1))
    fx = tf.keras.Input(shape=(*shape, 1))
    x = KL.concatenate([mov, fx])
    skips = []
    for f in enc:
        x = KL.LeakyReLU(0.2)(KL.Conv3D(f, 3, padding="same")(x))
        skips.append(x)
        x = KL.MaxPool3D(2)(x)
    for i, f in enumerate(dec[: len(enc)]):
        x = KL.LeakyReLU(0.2)(KL.Conv3D(f, 3, padding="same")(x))
        if i < len(enc) - 1:  # svf at half res
            x = KL.UpSampling3D(2)(x)
            x = KL.concatenate([x, skips[-(i + 1)]])
    for f in dec[len(enc) :]:
        x = KL.LeakyReLU(0.2)(KL.Conv3D(f, 3, padding="same")(x))
    svf = KL.Conv3D(3, 3, padding="same")(x)

    # Keras 3 functional graphs reject raw tf ops → wrap in Lambda layers
    def integrate(svf):
        flow = svf / 32.0
        for _ in range(5):
            flow = flow + trilinear_warp(flow, flow)
        return flow

    flow = KL.Lambda(integrate)(svf)
    full = KL.Lambda(lambda f: f * 2.0)(KL.UpSampling3D(2)(flow))
    moved = KL.Lambda(lambda t: trilinear_warp(t[0], t[1]))([mov, full])
    return tf.keras.Model([mov, fx], [moved, flow])


def measure_tf_cpu(shape=(96, 96, 96), iters=3,
                   enc=(64, 64, 64, 64), dec=(64, 64, 64, 64, 64, 64)):
    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")
    model = build_tf_forward(shape, enc=tuple(enc), dec=tuple(dec))
    a = np.zeros((1, *shape, 1), np.float32)
    fn = tf.function(lambda m, f: model([m, f]))
    fn(a, a)  # trace + warmup
    t0 = time.time()
    for _ in range(iters):
        out = fn(a, a)
    dt = (time.time() - t0) / iters
    return 1.0 / dt  # pairs/sec at this shape


if __name__ == "__main__":
    shape = (96, 96, 96)
    pps = measure_tf_cpu(shape)
    print({"shape": shape, "pairs_per_sec": pps})
