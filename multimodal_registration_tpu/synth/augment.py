"""Pair-generator augmentations, on device.

Parity targets:
  * random axis flips applied identically to source and target
    (`train_synthmorph.py:149-151`: a random-size random subset of axes),
  * ``set_random_zero_borders`` (`train_synthmorph.py:85-114`): per axis,
    a 50/50 coin between "no crop" and a random crop of up to ``1/scale`` of
    the axis on each side; voxels outside the box are zeroed,
  * the per-sample ``frac_zero_bord`` gate applied independently to source
    and target (`train_synthmorph.py:156-163`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def random_flips(key: jax.Array, vols, ndim: int = 3, axis_offset: int = 0):
    """Flip a random subset of spatial axes, the same subset for every volume
    in ``vols`` (matching the reference flipping src and trg together).

    The subset size m ~ U{0..ndim} and the m axes are chosen without
    replacement (`train_synthmorph.py:150`).
    """
    k_m, k_perm = jax.random.split(key)
    m = jax.random.randint(k_m, (), 0, ndim + 1)
    ranks = jax.random.permutation(k_perm, ndim)
    flip_mask = ranks < m  # exactly m random axes selected

    def apply(v):
        for ax in range(ndim):
            v = jnp.where(flip_mask[ax], jnp.flip(v, axis=ax + axis_offset), v)
        return v

    return tuple(apply(v) for v in vols)


def random_zero_borders(key: jax.Array, vol: jnp.ndarray, scale: int = 8) -> jnp.ndarray:
    """Zero voxels outside a random box (crop-then-zero-pad mimicry)."""
    shape = vol.shape[:3]
    keys = jax.random.split(key, 12)
    mask = jnp.ones((), jnp.bool_)
    out_mask = None
    for ax, dim in enumerate(shape):
        k_cmin, k_vmin, k_cmax, k_vmax = keys[4 * ax : 4 * ax + 4]
        lo_rand = jax.random.randint(k_vmin, (), 0, max(dim // scale, 1))
        lo = jnp.where(jax.random.bernoulli(k_cmin), 0, lo_rand)
        hi_rand = jax.random.randint(k_vmax, (), (scale - 1) * dim // scale, dim)
        hi = jnp.where(jax.random.bernoulli(k_cmax), dim, hi_rand)
        idx = jax.lax.broadcasted_iota(jnp.int32, shape, ax)
        ax_mask = (idx >= lo) & (idx < hi)
        out_mask = ax_mask if out_mask is None else (out_mask & ax_mask)
    return jnp.where(out_mask, vol, jnp.zeros((), vol.dtype))


def maybe_zero_borders(key: jax.Array, vol: jnp.ndarray, scale: int, frac: float) -> jnp.ndarray:
    """Apply :func:`random_zero_borders` with probability ``frac``."""
    k_coin, k_box = jax.random.split(key)
    zeroed = random_zero_borders(k_box, vol, scale)
    return jnp.where(jax.random.uniform(k_coin) < frac, zeroed, vol)
