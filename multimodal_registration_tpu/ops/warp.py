"""Dense-displacement spatial transformer (the hot op of the framework).

Semantics parity with ``vxm.layers.SpatialTransformer`` / ``vxm.utils.transform``
(`train_synthmorph.py:298`, `bids_registration.py:335`):

  * sample location = identity grid + displacement,
  * locations are clamped to ``[0, dim-1]`` (edge-clamp; ``fill_value=None``),
  * ``linear`` = trilinear over the 8 surrounding voxels,
  * ``nearest`` = round-half-to-even then gather.

The default implementation lowers to an XLA gather. A Pallas VMEM-blocked kernel
for the common "small displacement" case lives in ``ops.pallas.warp3d`` and is
dispatched automatically on TPU for suitable shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from multimodal_registration_tpu.ops.grid import identity_grid


def _gather_volume(vol_flat, ix, iy, iz, Y, Z):
    lin = (ix * Y + iy) * Z + iz
    return jnp.take(vol_flat, lin.reshape(-1), axis=0).reshape(*lin.shape, vol_flat.shape[-1])


def _sample_linear_blockgather(vol, c):
    """Trilinear sampling with ONE ``lax.gather`` of 2×2×2×C corner blocks.

    NOTE: NOT used on TPU — XLA pads the gather output's minor dims
    ((…,2,2,C) → (…,8,128) tiles), a ~20× memory expansion that OOMs at
    192³ (measured). Kept for CPU where it is compact and fast.
    Requires every spatial dim >= 2.
    """
    X, Y, Z, C = vol.shape
    batch_shape = c.shape[:-1]
    hi = jnp.array([X - 2, Y - 2, Z - 2], jnp.int32)
    i0 = jnp.minimum(jnp.floor(c).astype(jnp.int32), hi)
    w = (c - i0.astype(c.dtype)).astype(jnp.float32)  # in [0, 1]
    starts = i0.reshape(-1, 3)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3, 4), collapsed_slice_dims=(), start_index_map=(0, 1, 2)
    )
    blocks = jax.lax.gather(
        vol,
        starts,
        dn,
        slice_sizes=(2, 2, 2, C),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,  # i0 clamped above
    ).reshape(*batch_shape, 2, 2, 2, C)
    wx = jnp.stack([1.0 - w[..., 0], w[..., 0]], -1)
    wy = jnp.stack([1.0 - w[..., 1], w[..., 1]], -1)
    wz = jnp.stack([1.0 - w[..., 2], w[..., 2]], -1)
    hi_p = jax.lax.Precision.HIGHEST
    return jnp.einsum(
        "...abcd,...a,...b,...c->...d",
        blocks.astype(jnp.float32), wx, wy, wz,
        precision=hi_p,
    ).astype(vol.dtype)


def sample(vol: jnp.ndarray, coords: jnp.ndarray, interp: str = "linear") -> jnp.ndarray:
    """Sample ``vol`` at float voxel ``coords``.

    Args:
      vol: ``(X, Y, Z)`` or ``(X, Y, Z, C)`` volume.
      coords: ``(..., 3)`` absolute voxel coordinates.
      interp: ``'linear'`` or ``'nearest'``.

    Returns:
      ``(..., C)``-shaped samples (channel axis kept iff input had one).
    """
    squeeze = vol.ndim == 3
    if squeeze:
        vol = vol[..., None]
    X, Y, Z, C = vol.shape

    cdtype = coords.dtype if jnp.issubdtype(coords.dtype, jnp.floating) else jnp.float32
    dims = jnp.array([X - 1, Y - 1, Z - 1], dtype=cdtype)
    c = jnp.clip(coords.astype(cdtype), 0.0, dims)

    if interp == "nearest":
        idx = jnp.round(c).astype(jnp.int32)
        out = _gather_volume(vol.reshape(-1, C), idx[..., 0], idx[..., 1], idx[..., 2], Y, Z)
    elif min(X, Y, Z) >= 2 and jax.default_backend() == "cpu":
        out = _sample_linear_blockgather(vol, c)
    else:  # TPU path: 8 flat gathers (see blockgather note above)
        vol_flat = vol.reshape(-1, C)
        c0 = jnp.floor(c)
        w1 = c - c0
        i0 = c0.astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, jnp.array([X - 1, Y - 1, Z - 1], jnp.int32))
        out = None
        for dx in (0, 1):
            wx = w1[..., 0] if dx else 1.0 - w1[..., 0]
            ix = i1[..., 0] if dx else i0[..., 0]
            for dy in (0, 1):
                wy = w1[..., 1] if dy else 1.0 - w1[..., 1]
                iy = i1[..., 1] if dy else i0[..., 1]
                for dz in (0, 1):
                    wz = w1[..., 2] if dz else 1.0 - w1[..., 2]
                    iz = i1[..., 2] if dz else i0[..., 2]
                    corner = _gather_volume(vol_flat, ix, iy, iz, Y, Z)
                    w = (wx * wy * wz)[..., None].astype(vol.dtype)
                    out = corner * w if out is None else out + corner * w
    return out[..., 0] if squeeze else out


def warp(vol: jnp.ndarray, flow: jnp.ndarray, interp: str = "linear") -> jnp.ndarray:
    """Warp ``vol`` by dense displacement ``flow`` (``(X, Y, Z, 3)``).

    ``out(x) = vol(x + flow(x))`` with edge-clamped sampling — the parity
    contract of ``vxm.utils.transform`` (`train_synthmorph.py:67`).
    """
    grid = identity_grid(flow.shape[:-1], dtype=jnp.float32)
    return sample(vol, grid + flow.astype(jnp.float32), interp=interp)


def warp_batch(vol, flow, interp="linear"):
    """Batched warp over leading axis: ``vol (B,X,Y,Z,C)``, ``flow (B,X,Y,Z,3)``."""
    return jax.vmap(lambda v, f: warp(v, f, interp=interp))(vol, flow)


def warp_onehot(labels: jnp.ndarray, flow: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """Trilinear warp of ``one_hot(labels)`` without gathering one-hot data.

    Identity used: linear interpolation of a one-hot field equals the
    corner-weighted sum of the one-hots of the 8 gathered INTEGER labels —
    so only 1 channel is gathered instead of ``num_classes`` (26× less gather
    traffic for the SynthMorph training loss, `train_synthmorph.py:298`).
    Gradients w.r.t. ``flow`` flow through the interpolation weights exactly
    as in the dense formulation (the one-hot corner values are constants).

    Args: ``labels (X,Y,Z)`` int, ``flow (X,Y,Z,3)`` → ``(X,Y,Z,L)`` float32.
    """
    X, Y, Z = labels.shape
    grid = identity_grid((X, Y, Z), dtype=jnp.float32)
    c = jnp.clip(grid + flow.astype(jnp.float32), 0.0,
                 jnp.array([X - 1, Y - 1, Z - 1], jnp.float32))
    c0 = jnp.floor(c)
    w1 = c - c0
    i0 = c0.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, jnp.array([X - 1, Y - 1, Z - 1], jnp.int32))
    lab_flat = labels.reshape(-1)
    out = jnp.zeros((X, Y, Z, num_classes), jnp.float32)
    for dx in (0, 1):
        wx = w1[..., 0] if dx else 1.0 - w1[..., 0]
        ix = (i1 if dx else i0)[..., 0]
        for dy in (0, 1):
            wy = w1[..., 1] if dy else 1.0 - w1[..., 1]
            iy = (i1 if dy else i0)[..., 1]
            for dz in (0, 1):
                wz = w1[..., 2] if dz else 1.0 - w1[..., 2]
                iz = (i1 if dz else i0)[..., 2]
                lin = (ix * Y + iy) * Z + iz
                corner_lab = jnp.take(lab_flat, lin.reshape(-1), axis=0).reshape(X, Y, Z)
                w = (wx * wy * wz)[..., None]
                out = out + w * jax.nn.one_hot(corner_lab, num_classes, dtype=jnp.float32)
    return out
