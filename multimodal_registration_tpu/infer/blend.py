"""Pyramid-weighted blending of per-tile warp fields, on device.

Parity target: ``get_def_field_from_subvol`` (`bids_registration.py:226-271`):
a per-tile weight map ``1 - max(|x|,|y|,|z|) / (max+1)`` centered on the tile
(linearly decaying from the center), accumulated into full-volume weight and
field buffers, zero-sum guarded, then normalized.

The reference does this with ``2 × n_tiles`` full-volume host numpy buffers;
here the accumulation is two HBM buffers updated in-place with
``lax.dynamic_update_slice`` under jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def pyramid_weights(model_in_shape: tuple) -> np.ndarray:
    x, y, z = (s // 2 for s in model_in_shape)
    grid = np.mgrid[-x:x, -y:y, -z:z]
    w = np.maximum(np.abs(grid[0]), np.abs(grid[1]))
    w = np.maximum(w, np.abs(grid[2]))
    return (1.0 - w / (w.max() + 1.0)).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("im_shape", "coords"))
def _blend_jit(warps, w_map, im_shape, coords):
    weights = jnp.zeros(tuple(im_shape), jnp.float32)
    field = jnp.zeros((*im_shape, 3), jnp.float32)
    for t, (x0, _, y0, _, z0, _) in enumerate(coords):
        idx = (x0, y0, z0)
        cur_w = jax.lax.dynamic_slice(weights, idx, w_map.shape)
        weights = jax.lax.dynamic_update_slice(weights, cur_w + w_map, idx)
        cur_f = jax.lax.dynamic_slice(field, (*idx, 0), (*w_map.shape, 3))
        field = jax.lax.dynamic_update_slice(
            field, cur_f + warps[t] * w_map[..., None], (*idx, 0)
        )
    weights = jnp.where(weights == 0, 1.0, weights)  # zero-sum guard (:257)
    return field / weights[..., None]


def blend_subvol_fields(
    model_in_shape: tuple,
    im_shape: tuple,
    coords: list,
    warps,  # list/array of (sx, sy, sz, 3) per-tile fields
) -> jnp.ndarray:
    """Return the blended full-volume warp field ``(X, Y, Z, 3)``."""
    w_map = jnp.asarray(pyramid_weights(tuple(model_in_shape)))
    warps = jnp.asarray(jnp.stack([jnp.asarray(w) for w in warps]), jnp.float32)
    return _blend_jit(warps, w_map, tuple(im_shape), tuple(tuple(c) for c in coords))
