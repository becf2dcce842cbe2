"""On-device random label-map synthesis.

Parity target: ``generate_label_maps`` (`train_synthmorph.py:31-82`): draw a
multi-channel Perlin noise image (one channel per label), deform each channel
by its own Perlin warp, and take the voxelwise argmax to obtain a uint8 label
map. The reference runs this per-map on host TF (SURVEY §3.1 hot loop (b));
here each map is one jit call, and channels are processed with ``lax.map`` so
peak memory is O(volume), not O(volume × labels).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp

from multimodal_registration_tpu.ops.resize import _interp_matrix, resize
from multimodal_registration_tpu.ops.warp import warp
from multimodal_registration_tpu.synth.perlin import draw_perlin


def _warp_for_label(l, coarse_noises, label_weights, shape3):
    """One label's warp field from the shared coarse draws: interpolate its
    coarse slice along the label axis, then spatially resize. Mirrors
    neurite's joint (X, Y, Z, L, nd) perlin draw evaluated at label ``l``."""
    wf = None
    for noise, W in zip(coarse_noises, label_weights):
        sl = jnp.einsum("c,...cd->...d", W[l], noise)
        if sl.shape[:3] != tuple(shape3):
            zoom = tuple(o / s for o, s in zip(shape3, sl.shape[:3]))
            sl = resize(sl, zoom, out_shape=shape3)
        wf = sl if wf is None else wf + sl
    return wf


def generate_label_map(
    key: jax.Array,
    in_shape: Sequence[int],
    num_labels: int,
    im_scales: Sequence[float] = (16, 32, 64),
    def_scales: Sequence[float] = (8, 16, 32),
    im_max_std: float = 1.0,
    def_max_std: float = 3.0,
) -> jnp.ndarray:
    """One uint8 label map (values in ``[0, num_labels)``).

    ``in_shape`` may be 3-D ``(X, Y, Z)`` or 2-D ``(X, Y)`` — the reference
    generator supports both and saves 2-D maps as PNG
    (`train_synthmorph.py:53,71-80`). The 2-D case runs as a single-plane
    3-D volume with a zero z-displacement (num_dim=2 warp components).
    """
    in_shape = tuple(int(s) for s in in_shape)
    ndim = len(in_shape)
    if ndim not in (2, 3):
        raise ValueError(f"in_shape must be 2-D or 3-D, got {in_shape}")
    shape3 = in_shape if ndim == 3 else (*in_shape, 1)
    k_imstd, k_defstd, k_ch = jax.random.split(key, 3)
    # reference semantics (ne.utils.augment.draw_perlin over an (X,Y,Z,L)
    # tensor): ONE std per scale SHARED across all label channels — drawn
    # here once and threaded through the per-channel lax.map
    im_stds = jax.random.uniform(
        k_imstd, (len(tuple(im_scales)),), minval=0.0, maxval=im_max_std
    )
    def_stds = jax.random.uniform(
        k_defstd, (len(tuple(def_scales)),), minval=0.0, maxval=def_max_std
    )
    k_ch_im, k_ch_def = jax.random.split(k_ch)
    keys = jax.random.split(k_ch_im, num_labels)

    # Reference warp-draw semantics (`train_synthmorph.py:61-64` with
    # ne.utils.augment.draw_perlin): the (X, Y, Z, L, nd) warp tensor is
    # sampled at ``ceil(axis / scale)`` on EVERY axis but the last — the
    # label axis included — so neighbouring labels get smoothly CORRELATED
    # warps (identical once scale >= L). We keep the O(volume) lax.map by
    # sampling the per-scale coarse noise ONCE (shared by all labels, tiny)
    # and interpolating each label's coarse slice before the spatial resize.
    def_scales_t = tuple(def_scales)
    k_scale_noise = jax.random.split(k_ch_def, len(def_scales_t))
    L = int(num_labels)
    coarse_noises, label_weights = [], []
    for i, s in enumerate(def_scales_t):
        cs = tuple(int(math.ceil(d / s)) for d in shape3)
        cl = max(1, int(math.ceil(L / s)))
        noise = (
            jax.random.normal(k_scale_noise[i], (*cs, cl, ndim), jnp.float32)
            * def_stds[i]
        )
        coarse_noises.append(noise)
        label_weights.append(
            jnp.asarray(_interp_matrix(L, cl, L / cl), jnp.float32)
        )

    def channel(args):
        k, l = args
        im = draw_perlin(
            k, (*shape3, 1), im_scales, max_std=im_max_std, stds=im_stds
        )[..., 0]
        wf = _warp_for_label(l, coarse_noises, label_weights, shape3)
        if ndim == 2:  # zero z-component: displacement stays in-plane
            wf = jnp.concatenate([wf, jnp.zeros((*shape3, 1), wf.dtype)], axis=-1)
        return warp(im, wf, interp="linear")

    # lax.map keeps only one channel's temporaries live at a time
    warped = jax.lax.map(channel, (keys, jnp.arange(num_labels)))  # (L, X, Y, Z)
    lab = jnp.argmax(warped, axis=0).astype(jnp.uint8)
    return lab if ndim == 3 else lab[..., 0]


def generate_label_maps(
    key: jax.Array,
    num_maps: int,
    in_shape: Sequence[int],
    num_labels: int,
    **kwargs,
):
    """Host-side loop producing ``num_maps`` maps (each a single jit call)."""
    import numpy as np

    fn = jax.jit(
        lambda k: generate_label_map(k, in_shape, num_labels, **kwargs)
    )
    maps = []
    for i in range(num_maps):
        key, sub = jax.random.split(key)
        maps.append(np.asarray(fn(sub)))
    return maps
