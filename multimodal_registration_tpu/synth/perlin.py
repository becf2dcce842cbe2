"""Multi-scale ("Perlin") noise drawn fully on device.

Parity target: ``ne.utils.augment.draw_perlin``
(`train_synthmorph.py:57-64`, `gen_apply_def_field.py:59-60`): for each scale
``s``, sample Gaussian noise of shape ``ceil(spatial / s)`` (channel dims kept)
with a std drawn uniformly from ``[min_std, max_std]``, trilinearly upsample to
the output shape (corner-aligned), and sum over scales.

The reference runs this on host TF, one map at a time (the label-synthesis hot
loop noted in SURVEY §3.1); here it is pure jax.random + MXU resizes, jit- and
vmap-friendly, so synthesis never leaves the device.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp

from multimodal_registration_tpu.ops.resize import resize


def draw_perlin(
    key: jax.Array,
    out_shape: Sequence[int],
    scales,
    min_std: float = 0.0,
    max_std: float = 1.0,
    dtype=jnp.float32,
    stds=None,
) -> jnp.ndarray:
    """Draw multi-scale noise of shape ``out_shape`` = (X, Y, Z, [C...]).

    Trailing (non-spatial) dims are treated as channels, matching the
    reference's use with ``(X, Y, Z, L)`` images and ``(X, Y, Z, L, 3)``
    per-channel warps. NOTE the reference semantics: ONE std is drawn per
    scale and shared across ALL channels of that call. ``stds`` (one traced
    scalar per scale) overrides the internal draw — used by the label-map
    generator, which processes channels one at a time under ``lax.map`` but
    must still share the per-scale stds across channels.
    """
    out_shape = tuple(int(s) for s in out_shape)
    spatial = out_shape[:3]
    chan = out_shape[3:]
    nchan = int(math.prod(chan)) if chan else 1
    if isinstance(scales, (int, float)):
        scales = [scales]
    if stds is not None and len(stds) != len(scales):
        raise ValueError(f"need one std per scale: {len(stds)} vs {len(scales)}")

    total = jnp.zeros((*spatial, nchan), dtype)
    for i, scale in enumerate(scales):
        key, k_std, k_noise = jax.random.split(key, 3)
        sample_spatial = tuple(int(math.ceil(d / scale)) for d in spatial)
        if stds is not None:
            std = jnp.asarray(stds[i], dtype)
        else:
            std = jax.random.uniform(
                k_std, (), minval=min_std, maxval=max_std, dtype=dtype
            )
        noise = jax.random.normal(k_noise, (*sample_spatial, nchan), dtype) * std
        if sample_spatial != spatial:
            zoom = tuple(o / s for o, s in zip(spatial, sample_spatial))
            noise = resize(noise, zoom, out_shape=spatial)
        total = total + noise
    return total.reshape(out_shape)
