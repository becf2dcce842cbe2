"""Separable corner-aligned trilinear resize, MXU-friendly.

Parity target: ``ne.utils.resize`` / ``vxm.layers.RescaleTransform`` /
``vxm.utils.rescale_dense_transform`` (`bids_registration.py:398`). Neurite maps
output voxel ``i`` to input coordinate ``i / zoom`` (corner-aligned at the
origin, edge-clamped at the far side) — NOT the half-pixel-centered convention
of ``jax.image.resize``. We therefore build explicit 1-D interpolation matrices
and contract them along each axis; on TPU these small dense matmuls run on the
MXU and XLA fuses the three contractions, which is far faster than a gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=128)
def _interp_matrix(n_out: int, n_in: int, zoom: float) -> np.ndarray:
    """M[i, j] weights so that out = M @ in samples in[i / zoom], edge-clamped."""
    x = np.arange(n_out, dtype=np.float64) / zoom
    x = np.clip(x, 0, n_in - 1)
    lo = np.floor(x).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    w_hi = x - lo
    M = np.zeros((n_out, n_in), dtype=np.float32)
    M[np.arange(n_out), lo] += (1.0 - w_hi).astype(np.float32)
    M[np.arange(n_out), hi] += w_hi.astype(np.float32)
    return M


def _upsample2x_axis(v: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Exact corner-aligned 2× linear upsample along one axis:
    ``out[2i] = v[i]``, ``out[2i+1] = (v[i] + v[i+1]) / 2`` (edge-clamped) —
    identical to the zoom-2 interpolation matrix, but pure VPU interleaving
    instead of a dense matmul (the einsum route burns ~200 GFLOPs on a
    2-sparse operator at 192³ — see PERF.md)."""
    import jax.lax as lax

    n = v.shape[axis]
    nxt = jnp.concatenate(
        [
            lax.slice_in_dim(v, 1, n, axis=axis),
            lax.slice_in_dim(v, n - 1, n, axis=axis),
        ],
        axis=axis,
    )
    mid = 0.5 * (v + nxt)
    out = jnp.stack([v, mid], axis=axis + 1)
    return out.reshape(*v.shape[:axis], 2 * n, *v.shape[axis + 1 :])


def resize(vol: jnp.ndarray, zoom, out_shape=None) -> jnp.ndarray:
    """Resize spatial dims of ``(X, Y, Z, [C])`` by ``zoom`` (scalar or 3-seq)."""
    squeeze = vol.ndim == 3
    if squeeze:
        vol = vol[..., None]
    if np.isscalar(zoom):
        zoom = (zoom, zoom, zoom)
    in_shape = vol.shape[:3]
    if out_shape is None:
        out_shape = tuple(int(round(s * z)) for s, z in zip(in_shape, zoom))

    # fast exact paths for the model's power-of-two rescales
    if all(float(z) == 2.0 for z in zoom) and tuple(out_shape) == tuple(
        2 * s for s in in_shape
    ):
        v = vol.astype(vol.dtype if jnp.issubdtype(vol.dtype, jnp.floating) else jnp.float32)
        # minor-axis-first order measured 12% faster than major-first
        # (rescale_probe.py B: 2.52 vs 2.87 ms at 96³→192³x3, maxerr 0) —
        # the z interleave runs while rows are still the short input length
        for ax in (2, 1, 0):
            v = _upsample2x_axis(v, ax)
        return v[..., 0] if squeeze else v
    if (all(float(z) == 0.5 for z in zoom)
            and all(s % 2 == 0 for s in in_shape)  # vol[::2] is ceil(n/2)
            and tuple(out_shape) == tuple(s // 2 for s in in_shape)):
        v = vol[::2, ::2, ::2]  # zoom-0.5 matrix is an exact stride-2 pick
        v = v.astype(v.dtype if jnp.issubdtype(v.dtype, jnp.floating) else jnp.float32)
        return v[..., 0] if squeeze else v

    mats = [
        jnp.asarray(_interp_matrix(int(o), int(s), float(z)))
        for o, s, z in zip(out_shape, in_shape, zoom)
    ]
    dtype = vol.dtype if jnp.issubdtype(vol.dtype, jnp.floating) else jnp.float32
    v = vol.astype(dtype)
    # interpolation weights must not be rounded to bf16 — force full precision
    hi = jax.lax.Precision.HIGHEST
    v = jnp.einsum("ax,xyzd->ayzd", mats[0].astype(dtype), v, precision=hi)
    v = jnp.einsum("by,xyzd->xbzd", mats[1].astype(dtype), v, precision=hi)
    v = jnp.einsum("cz,xyzd->xycd", mats[2].astype(dtype), v, precision=hi)
    return v[..., 0] if squeeze else v


def rescale_field(flow: jnp.ndarray, factor, out_shape=None) -> jnp.ndarray:
    """Resize a dense displacement field and scale its vectors by ``factor``.

    Parity: ``vxm.layers.RescaleTransform`` (model-internal flow rescaling) and
    ``vxm.utils.rescale_dense_transform`` (`bids_registration.py:398`).
    """
    if np.isscalar(factor):
        f3 = (factor, factor, factor)
    else:
        f3 = tuple(factor)
    out = resize(flow, f3, out_shape=out_shape)
    scale = jnp.asarray(f3, dtype=out.dtype)
    return out * scale
