"""Identity grids and coordinate helpers for dense-displacement warping."""

from __future__ import annotations

import functools

import jax.numpy as jnp


@functools.lru_cache(maxsize=32)
def _identity_grid_cached(shape: tuple, dtype_name: str):
    import numpy as np

    axes = [np.arange(s, dtype=dtype_name) for s in shape]
    mesh = np.meshgrid(*axes, indexing="ij")
    return np.stack(mesh, axis=-1)


def identity_grid(shape, dtype=jnp.float32):
    """(X, Y, Z, 3) grid of voxel coordinates with ``ij`` indexing.

    Matches the meshgrid used by the reference warp op
    (``ne.utils.volshape_to_meshgrid`` called from ``vxm.utils.transform``,
    consumed at `train_synthmorph.py:67` and by ``SpatialTransformer``).
    """
    return jnp.asarray(_identity_grid_cached(tuple(int(s) for s in shape), jnp.dtype(dtype).name))
