"""Dense-displacement spatial transformer (the hot op of the framework).

Semantics parity with ``vxm.layers.SpatialTransformer`` / ``vxm.utils.transform``
(`train_synthmorph.py:298`, `bids_registration.py:335`):

  * sample location = identity grid + displacement,
  * locations are clamped to ``[0, dim-1]`` (edge-clamp; ``fill_value=None``),
  * ``linear`` = trilinear over the 8 surrounding voxels,
  * ``nearest`` = round-half-to-even then gather.

Implementations (selected automatically; override with ``MMREG_WARP_MODE``):

  * ``packed`` (TPU default): this backend's gather row rate is ~110 M
    rows/s while the SOURCE is < ~100 MB and collapses ~6x above ~200 MB
    (benchmarks/gather_probe.py — a fast staging tier). So we pre-pack every
    2x2x2xC corner neighborhood into one contiguous row via 8 edge-padded
    shifted copies (pure memory-bound writes) and issue ONE gather of N rows
    instead of 8 gathers (8N rows); when the packed source exceeds the
    budget, the gather is slabbed along X so each chunk's source stays under
    the cliff (see the chunked section below). The autodiff transpose
    inherits the same row reduction and slab structure (one packed
    scatter-add per slab instead of 8 whole-volume scatters) — the dominant
    cost of the scaling-and-squaring backward in training.
  * ``blockgather`` (CPU default): one ``lax.gather`` of 2x2x2xC blocks —
    compact on CPU, but on TPU the block output's minor dims are layout-padded
    to (8,128) tiles (~20x expansion, OOMs at 192^3; measured).
  * ``gather8``: the plain 8-corner flat-gather formulation (reference
    semantics baseline; kept for equivalence tests and as a fallback).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from multimodal_registration_tpu.ops.grid import identity_grid


def _gather_volume(vol_flat, ix, iy, iz, Y, Z):
    lin = (ix * Y + iy) * Z + iz
    return jnp.take(vol_flat, lin.reshape(-1), axis=0).reshape(*lin.shape, vol_flat.shape[-1])


def _warp_mode() -> str:
    mode = os.environ.get("MMREG_WARP_MODE", "auto")
    if mode != "auto":
        return mode
    return "blockgather" if jax.default_backend() == "cpu" else "packed"


def pack_corners(vol: jnp.ndarray) -> jnp.ndarray:
    """Pack the 2x2x2 corner neighborhood of every voxel into one row.

    ``out[x*Y*Z + y*Z + z, (dx*4 + dy*2 + dz)*C + c] = vol[min(x+dx, X-1),
    min(y+dy, Y-1), min(z+dz, Z-1), c]`` — edge padding reproduces the
    clamped ``i1 = min(i0+1, dim-1)`` corner of the reference transformer.

    Built from 8 shifted whole-volume copies: pure sequential HBM traffic
    (8x vol bytes), no random access.
    """
    X, Y, Z, C = vol.shape
    vp = jnp.pad(vol, ((0, 1), (0, 1), (0, 1), (0, 0)), mode="edge")
    corners = [
        vp[dx:dx + X, dy:dy + Y, dz:dz + Z]
        for dx in (0, 1)
        for dy in (0, 1)
        for dz in (0, 1)
    ]
    return jnp.concatenate(corners, axis=-1).reshape(X * Y * Z, 8 * C)


def _corner_weights(w):
    """(..., 3) fractional offsets -> (..., 8) trilinear corner weights.

    Corner order matches :func:`pack_corners` (dx major, dz minor).
    """
    wx = jnp.stack([1.0 - w[..., 0], w[..., 0]], -1)
    wy = jnp.stack([1.0 - w[..., 1], w[..., 1]], -1)
    wz = jnp.stack([1.0 - w[..., 2], w[..., 2]], -1)
    w8 = wx[..., :, None, None] * wy[..., None, :, None] * wz[..., None, None, :]
    return w8.reshape(*w.shape[:-1], 8)


def _corner_onehot(c):
    """(..., 3) clipped coords -> (..., 8) one-hot of the ROUNDED corner.

    ``jnp.round(c) - floor(c)`` ∈ {0,1} per axis, so nearest-neighbor
    sampling is a corner SELECT over the same packed 2x2x2 rows the linear
    path gathers — round-half-to-even semantics preserved exactly. This lets
    nearest reuse the whole packed/chunked machinery instead of gathering
    from a (V, C) source whose 128-lane padding (C=1 → 512 B/row) puts it
    16x over the gather cliff at volume scale.
    """
    d = (jnp.round(c) - jnp.floor(c)).astype(jnp.int32)
    k = d[..., 0] * 4 + d[..., 1] * 2 + d[..., 2]
    return jax.nn.one_hot(k, 8, dtype=jnp.float32)


def _floor_base(c, X, Y, Z):
    """Floor corner index + fractional weight for pre-clipped coords."""
    i0 = jnp.floor(c).astype(jnp.int32)  # in [0, dim-1] since c is clipped
    w = (c - i0.astype(c.dtype)).astype(jnp.float32)
    lin = (i0[..., 0] * Y + i0[..., 1]) * Z + i0[..., 2]
    return lin, w


def _take_rows(packed_2d: jnp.ndarray, lin: jnp.ndarray) -> jnp.ndarray:
    """Gather rows of a (V, W) array.

    Measured on this backend (warp_bench): a plain row ``jnp.take`` runs at
    the element rate of the narrow-row formulation (so 8x fewer rows is
    neutral at huge sources) but ~4.5x faster when the source is small
    (<~100 MB) — and a 1-D flattened source with ``slice_sizes=(W,)`` is
    catastrophically slow (12 s vs 0.36 s at 192^3; slice-gathers on 1-D
    operands hit a serial path). Keep the 2-D row take.
    """
    return jnp.take(packed_2d, lin.reshape(-1), axis=0)


def _sample_packed(vol, c, w8):
    """Corner-weighted sampling via ONE row-gather of pre-packed corner
    blocks; ``w8`` is trilinear weights (linear) or a one-hot (nearest)."""
    X, Y, Z, C = vol.shape
    batch_shape = c.shape[:-1]
    lin, _ = _floor_base(c, X, Y, Z)
    packed = pack_corners(vol)
    rows = _take_rows(packed, lin)  # (N, 8C)
    blocks = rows.reshape(*batch_shape, 8, C).astype(jnp.float32)
    out = jnp.einsum(
        "...kc,...k->...c", blocks, w8, precision=jax.lax.Precision.HIGHEST
    )
    return out.astype(vol.dtype)


# ---- chunked packed warp (the fast path for big volumes) --------------------
#
# Measured on this backend (benchmarks/gather_probe.py + round-2 remeasure):
# gather row rate is ~110-160 M rows/s while the source's PADDED size is
# under ~500 MB and collapses ~4-6x above ~700 MB. "Padded" because TPU
# lays the (rows, 8C) packed source out in (sublane, 128-lane) tiles — a
# width-8 f32 row occupies 512 bytes, 16x its logical size. (This is what
# every probe point agrees on: width-24 f32 fast at 453 MB padded / slow at
# 1.07 GB; int8 width-8 onehot pack fast at 628 MB; the C=1 moved-image
# warp slow at 1.2 GB padded even though only 75 MB logical.) So for
# sources over budget we slab the packed corner volume along X (slab =
# output chunk + displacement halo H) and gather within each slab under
# lax.map. A runtime guard max|flow_x| <= H-1 falls back to the unchunked
# gather via lax.cond when the halo is exceeded.

def _gather_budget() -> int:
    """PADDED-byte budget for one gather source (see layout note above)."""
    return int(os.environ.get("MMREG_GATHER_SRC_BUDGET", 480_000_000))


def _padded_row_bytes(C: int, itemsize: int) -> int:
    """Bytes one packed (8C,) row occupies in TPU tiled layout (128 lanes)."""
    return max(8 * C, 128) * itemsize


def _chunk_plan(X: int, Y: int, Z: int, C: int, itemsize: int):
    """Pick (halo H, n_chunks, slab planes S) or None if chunking is moot."""
    budget = _gather_budget()
    plane = Y * Z * _padded_row_bytes(C, itemsize)
    if X * plane <= budget:
        return None  # whole packed source already under the cliff
    for H in (16, 8, 4):
        for n in range(2, X + 1):
            if X % n:
                continue
            S = X // n + 2 * H
            if S >= X:
                continue
            if S * plane <= budget:
                return H, n, S
    return None


def _chunked_body(vol, c, w8, H, n_chunks, S):
    """Chunked packed corner-weighted warp body (``w8``: trilinear weights or
    nearest one-hot). CORRECT ONLY when every ``|flow_x| <= H-1`` — callers
    must guard with the halo cond."""
    X, Y, Z, C = vol.shape
    CX = X // n_chunks
    packed4 = pack_corners(vol).reshape(X, Y, Z, 8 * C)
    lin, _ = _floor_base(c, X, Y, Z)
    i0x = jnp.floor(c[..., 0]).astype(jnp.int32)
    hi_p = jax.lax.Precision.HIGHEST

    def chunk_fn(k):
        x0 = k * CX
        s = jnp.clip(x0 - H, 0, X - S)
        slab = jax.lax.dynamic_slice(packed4, (s, 0, 0, 0), (S, Y, Z, 8 * C))
        ix = jax.lax.dynamic_slice(i0x, (x0, 0, 0), (CX, Y, Z))
        iyz = jax.lax.dynamic_slice(
            lin, (x0, 0, 0), (CX, Y, Z)
        ) - ix * (Y * Z)  # lin = (ix*Y + iy)*Z + iz → iy*Z + iz remainder
        ixr = jnp.clip(ix - s, 0, S - 1)
        lin_s = ixr * (Y * Z) + iyz
        rows = jnp.take(slab.reshape(S * Y * Z, 8 * C), lin_s.reshape(-1), axis=0)
        blocks = rows.reshape(CX, Y, Z, 8, C).astype(jnp.float32)
        w8c = jax.lax.dynamic_slice(w8, (x0, 0, 0, 0), (CX, Y, Z, 8))
        return jnp.einsum("...kc,...k->...c", blocks, w8c, precision=hi_p)

    # checkpoint: reverse-mode AD through lax.map would otherwise stack every
    # chunk's gathered f32 blocks as scan residuals — (n_chunks, CX, Y, Z, 8,
    # C) f32 is ~19 GB at the training shape (OOMs HBM). Recomputing the slab
    # gather in the backward costs one extra gather pass and ~zero memory.
    out = jax.lax.map(jax.checkpoint(chunk_fn), jnp.arange(n_chunks))
    return out.reshape(X, Y, Z, C)


def _packed_full(vol, c, w8):
    """Unchunked whole-volume packed gather (the halo-overflow fallback)."""
    X, Y, Z, C = vol.shape
    lin, _ = _floor_base(c, X, Y, Z)
    rows = _take_rows(pack_corners(vol), lin)
    blocks = rows.reshape(X, Y, Z, 8, C).astype(jnp.float32)
    return jnp.einsum(
        "...kc,...k->...c", blocks, w8,
        precision=jax.lax.Precision.HIGHEST,
    )


def _warp_packed_chunked(vol, c, w8, flow_x, H, n_chunks, S):
    """Chunked packed corner-weighted warp; falls back when |flow_x| > H-1.

    NOTE: do NOT call under ``jax.vmap`` — vmap turns the guard ``lax.cond``
    into a select that executes BOTH branches, paying the whole-volume
    fallback gather on every call (measured 3x slowdown on the model's
    moved-image warp). Batched callers go through :func:`warp_batch`, which
    hoists the cond above the vmap.
    """
    in_halo = jnp.max(jnp.abs(flow_x)) <= float(H - 1)
    return jax.lax.cond(
        in_halo,
        lambda _: _chunked_body(vol, c, w8, H, n_chunks, S),
        lambda _: _packed_full(vol, c, w8),
        0,
    ).astype(vol.dtype)


def _sample_linear_blockgather(vol, c):
    """Trilinear sampling with ONE ``lax.gather`` of 2x2x2xC corner blocks.

    NOTE: NOT used on TPU — XLA pads the gather output's minor dims
    ((…,2,2,C) → (…,8,128) tiles), a ~20x memory expansion that OOMs at
    192^3 (measured). Kept for CPU where it is compact and fast.
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


def _sample_linear_gather8(vol, c):
    """Plain 8-corner flat-gather trilinear sampling (fallback/baseline)."""
    X, Y, Z, C = vol.shape
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
    return out


def _nearest_use_packed(vol: jnp.ndarray) -> bool:
    """Whether nearest sampling should take the packed corner-select path.

    The packed one-hot select runs the values through an f32 einsum — exact
    only for |v| <= 2**24, so 32/64-bit integer volumes (which may exceed it)
    keep the flat round-and-gather path, which is exact for any int32.
    And it pays off only while the (V, 8C) packed row pads to the same 128
    lanes as the (V, C) flat row (C <= 16); past that the packed source is up
    to 8x larger than the flat one (advisor round-2 findings).
    """
    C = vol.shape[-1]
    wide_int = (
        jnp.issubdtype(vol.dtype, jnp.integer)
        and jnp.dtype(vol.dtype).itemsize >= 4
    )
    return 8 * C <= 128 and not wide_int


def sample(vol: jnp.ndarray, coords: jnp.ndarray, interp: str = "linear") -> jnp.ndarray:
    """Sample ``vol`` at float voxel ``coords``.

    Args:
      vol: ``(X, Y, Z)`` or ``(X, Y, Z, C)`` volume.
      coords: ``(..., 3)`` absolute voxel coordinates.
      interp: ``'linear'`` or ``'nearest'``.

    Returns:
      ``(..., C)``-shaped samples (channel axis kept iff input had one).

    Nearest sampling of float volumes (and of small-int volumes on the packed
    TPU path) mixes values through an f32 one-hot einsum — exact for
    magnitudes <= 2**24; int32/int64 volumes automatically take the flat
    gather path, which is exact for any value.
    """
    squeeze = vol.ndim == 3
    if squeeze:
        vol = vol[..., None]
    X, Y, Z, C = vol.shape

    cdtype = coords.dtype if jnp.issubdtype(coords.dtype, jnp.floating) else jnp.float32
    dims = jnp.array([X - 1, Y - 1, Z - 1], dtype=cdtype)
    c = jnp.clip(coords.astype(cdtype), 0.0, dims)

    if interp == "nearest":
        if _warp_mode() == "packed" and _nearest_use_packed(vol):
            # corner-select over the packed rows: a (V, C<=16) flat source
            # pads to the same 128 lanes as the (V, 8C) packed one, and the
            # packed formulation shares the linear path's fast row gather
            out = _sample_packed(vol, c, _corner_onehot(c))
        else:
            idx = jnp.round(c).astype(jnp.int32)
            out = _gather_volume(
                vol.reshape(-1, C), idx[..., 0], idx[..., 1], idx[..., 2], Y, Z
            )
    else:
        mode = _warp_mode()
        if mode == "blockgather" and min(X, Y, Z) >= 2:
            out = _sample_linear_blockgather(vol, c)
        elif mode == "gather8":
            out = _sample_linear_gather8(vol, c)
        else:
            lin_w = c - jnp.floor(c)
            out = _sample_packed(vol, c, _corner_weights(lin_w))
    return out[..., 0] if squeeze else out


def warp(vol: jnp.ndarray, flow: jnp.ndarray, interp: str = "linear") -> jnp.ndarray:
    """Warp ``vol`` by dense displacement ``flow`` (``(X, Y, Z, 3)``).

    ``out(x) = vol(x + flow(x))`` with edge-clamped sampling — the parity
    contract of ``vxm.utils.transform`` (`train_synthmorph.py:67`).
    """
    grid = identity_grid(flow.shape[:-1], dtype=jnp.float32)
    coords = grid + flow.astype(jnp.float32)
    if interp in ("linear", "nearest") and _warp_mode() == "packed":
        squeeze = vol.ndim == 3
        v4 = vol[..., None] if squeeze else vol
        X, Y, Z, C = v4.shape
        if interp == "nearest" and not _nearest_use_packed(v4):
            return sample(vol, coords, interp=interp)
        if (X, Y, Z) == tuple(flow.shape[:-1]):
            plan = _chunk_plan(X, Y, Z, C, jnp.dtype(v4.dtype).itemsize)
            if plan is not None:
                dims = jnp.array([X - 1, Y - 1, Z - 1], jnp.float32)
                c = jnp.clip(coords, 0.0, dims)
                w8 = (
                    _corner_weights(c - jnp.floor(c))
                    if interp == "linear"
                    else _corner_onehot(c)
                )
                out = _warp_packed_chunked(v4, c, w8, flow[..., 0], *plan)
                return out[..., 0] if squeeze else out
    return sample(vol, coords, interp=interp)


def warp_batch(vol, flow, interp="linear"):
    """Batched warp over leading axis: ``vol (B,X,Y,Z,C[=absent])``,
    ``flow (B,X,Y,Z,3)``.

    NOT a plain ``vmap(warp)``: the chunked packed path guards its halo with
    ``lax.cond``, and vmap converts a batched-predicate cond into a select
    that executes BOTH branches — every call would pay the whole-volume
    fallback gather on top of the chunked one. Here the halo predicate is
    reduced over the whole batch and the cond sits ABOVE the vmap, so it
    stays a real runtime conditional (and reduces with a cheap collective
    when the batch is sharded over the ``data`` mesh axis).
    """
    squeeze = vol.ndim == 4
    v5 = vol[..., None] if squeeze else vol
    B, X, Y, Z, C = v5.shape
    use_chunked = (
        interp in ("linear", "nearest")
        and _warp_mode() == "packed"
        and (X, Y, Z) == tuple(flow.shape[1:4])
        and (interp != "nearest" or _nearest_use_packed(v5))
    )
    plan = _chunk_plan(X, Y, Z, C, jnp.dtype(v5.dtype).itemsize) if use_chunked else None
    if plan is None:
        out = jax.vmap(lambda v, f: warp(v, f, interp=interp))(v5, flow)
        return out[..., 0] if squeeze else out

    H, n_chunks, S = plan
    grid = identity_grid((X, Y, Z), dtype=jnp.float32)
    dims = jnp.array([X - 1, Y - 1, Z - 1], jnp.float32)
    c = jnp.clip(grid[None] + flow.astype(jnp.float32), 0.0, dims)
    w8 = _corner_weights(c - jnp.floor(c)) if interp == "linear" else _corner_onehot(c)
    in_halo = jnp.max(jnp.abs(flow[..., 0])) <= float(H - 1)
    out = jax.lax.cond(
        in_halo,
        lambda _: jax.vmap(
            lambda v, cc, ww: _chunked_body(v, cc, ww, H, n_chunks, S)
        )(v5, c, w8),
        lambda _: jax.vmap(_packed_full)(v5, c, w8),
        0,
    ).astype(v5.dtype)
    return out[..., 0] if squeeze else out


def _fused_up2x_chunk_body(vol4, flow_half, H, n_chunks, S):
    """Chunked packed warp whose coordinates come from the 2x corner-aligned
    upsample of a HALF-RES field, computed per-chunk (never materializing the
    full-res field). CORRECT ONLY when every ``2*|flow_half_x| <= H-1``."""
    from multimodal_registration_tpu.ops.resize import _upsample2x_axis

    X, Y, Z, C = vol4.shape
    CX = X // n_chunks
    CXh = CX // 2
    packed4 = pack_corners(vol4).reshape(X, Y, Z, 8 * C)
    # one edge plane appended so every chunk's x-interleave can read its
    # (i+1) neighbor without per-chunk boundary cases: rescale_field's
    # far-edge clamp == reading the duplicated plane
    fp = jnp.pad(flow_half.astype(jnp.float32),
                 ((0, 1), (0, 0), (0, 0), (0, 0)), mode="edge")
    dims = jnp.array([X - 1, Y - 1, Z - 1], jnp.float32)
    gy = jnp.arange(Y, dtype=jnp.float32)[None, :, None]
    gz = jnp.arange(Z, dtype=jnp.float32)[None, None, :]
    hi_p = jax.lax.Precision.HIGHEST

    def chunk_fn(k):
        x0 = k * CX
        s = jnp.clip(x0 - H, 0, X - S)
        slab = jax.lax.dynamic_slice(packed4, (s, 0, 0, 0), (S, Y, Z, 8 * C))
        fs = jax.lax.dynamic_slice(
            fp, (k * CXh, 0, 0, 0), (CXh + 1, fp.shape[1], fp.shape[2], 3)
        )
        f = _upsample2x_axis(_upsample2x_axis(fs, 2), 1)  # minor-axis-first
        a = f[:CXh]
        b = f[1:CXh + 1]
        fx = jnp.stack([a, 0.5 * (a + b)], axis=1).reshape(CX, Y, Z, 3)
        flow_c = 2.0 * fx  # rescale_field scales vectors by the zoom factor
        gx = (x0.astype(jnp.float32)
              + jnp.arange(CX, dtype=jnp.float32))[:, None, None]
        grid = jnp.stack(jnp.broadcast_arrays(gx, gy, gz), axis=-1)
        c = jnp.clip(grid + flow_c, 0.0, dims)
        lin, w = _floor_base(c, X, Y, Z)
        w8 = _corner_weights(w)
        ix = jnp.floor(c[..., 0]).astype(jnp.int32)
        iyz = lin - ix * (Y * Z)
        ixr = jnp.clip(ix - s, 0, S - 1)
        rows = jnp.take(
            slab.reshape(S * Y * Z, 8 * C),
            (ixr * (Y * Z) + iyz).reshape(-1), axis=0,
        )
        blocks = rows.reshape(CX, Y, Z, 8, C).astype(jnp.float32)
        return jnp.einsum("...kc,...k->...c", blocks, w8, precision=hi_p)

    out = jax.lax.map(jax.checkpoint(chunk_fn), jnp.arange(n_chunks))
    return out.reshape(X, Y, Z, C)


def warp_up2x_batch(vol, flow_half):
    """Warp full-res ``vol (B, X, Y, Z[, C])`` by the 2x corner-aligned
    upsample of a half-res displacement field ``flow_half (B, X/2, Y/2, Z/2,
    3)`` WITHOUT materializing the full-res field: each packed-warp chunk
    upsamples only its own field slab inside the chunk loop. Equal (up to
    f32 rounding order) to ``warp_batch(vol, vmap(rescale_field(., 2)))``.

    Motivation (VERDICT r4 directive 2): the model's full-res rescale
    measured 12.2 ms in-context vs ~3 ms isolated — the gap is layout copies
    between the global interleave and the warp's coordinate math. Streaming
    the upsample per-chunk removes the 85 MB full-res field materialization
    (and lets XLA DCE the exported ``flow_fullres`` output when no consumer
    asks for it). Linear interp only (the model's moved-image warp,
    `train_synthmorph.py:298`).
    """
    from multimodal_registration_tpu.ops.resize import rescale_field

    squeeze = vol.ndim == 4
    v5 = vol[..., None] if squeeze else vol
    B, X, Y, Z, C = v5.shape
    assert tuple(flow_half.shape[1:4]) == (X // 2, Y // 2, Z // 2), (
        f"flow_half {flow_half.shape} is not the half grid of {v5.shape}"
    )
    plan = (_chunk_plan(X, Y, Z, C, jnp.dtype(v5.dtype).itemsize)
            if _warp_mode() == "packed" else None)
    if plan is not None and (X // plan[1]) % 2:
        plan = None  # chunk width must be even to interleave x in-chunk

    def _full_coords():
        full = jax.vmap(
            lambda f: rescale_field(f, 2, out_shape=(X, Y, Z))
        )(flow_half.astype(jnp.float32))
        grid = identity_grid((X, Y, Z), dtype=jnp.float32)
        dims = jnp.array([X - 1, Y - 1, Z - 1], jnp.float32)
        return jnp.clip(grid[None] + full, 0.0, dims)

    if plan is None:
        full = jax.vmap(
            lambda f: rescale_field(f, 2, out_shape=(X, Y, Z))
        )(flow_half.astype(jnp.float32))
        out = warp_batch(v5, full, interp="linear")
        return out[..., 0] if squeeze else out

    H, n_chunks, S = plan
    in_halo = 2.0 * jnp.max(jnp.abs(flow_half[..., 0])) <= float(H - 1)

    def _fallback(_):
        c = _full_coords()
        w8 = _corner_weights(c - jnp.floor(c))
        return jax.vmap(_packed_full)(v5, c, w8)

    out = jax.lax.cond(
        in_halo,
        lambda _: jax.vmap(
            lambda v, f: _fused_up2x_chunk_body(v, f, H, n_chunks, S)
        )(v5, flow_half),
        _fallback,
        0,
    ).astype(v5.dtype)
    return out[..., 0] if squeeze else out


def _packed_label_rows(labels: jnp.ndarray, flow: jnp.ndarray, num_classes: int):
    """Shared int-corner gather: pack the 8 corner labels per voxel (int8 when
    they fit) and gather one row per output voxel. Returns ``(rows int32
    (X,Y,Z,8), c)`` with ``c`` the clipped absolute coords."""
    X, Y, Z = labels.shape
    grid = identity_grid((X, Y, Z), dtype=jnp.float32)
    c = jnp.clip(grid + flow.astype(jnp.float32), 0.0,
                 jnp.array([X - 1, Y - 1, Z - 1], jnp.float32))
    lin, _ = _floor_base(c, X, Y, Z)
    pack_dtype = jnp.int8 if num_classes <= 127 else jnp.int32
    packed = pack_corners(labels.astype(pack_dtype)[..., None])  # (V, 8)
    rows = _take_rows(packed, lin).reshape(X, Y, Z, 8).astype(jnp.int32)
    return rows, c


def warp_labels_soft_hard(labels: jnp.ndarray, flow: jnp.ndarray, num_classes: int):
    """Warp an integer label map, returning BOTH the soft (trilinearly
    interpolated one-hot — the SynthMorph training target, see
    :func:`warp_onehot`) and hard (nearest-neighbor) results from ONE packed
    corner gather. The nearest map is a one-hot corner SELECT over the same
    gathered rows the soft map mixes — exact ``jnp.round`` semantics — so the
    synthesis engine pays a single V-row gather instead of two (and the
    select path has no chunk/cond, making it safe under ``vmap``).

    Args: ``labels (X,Y,Z)`` int, ``flow (X,Y,Z,3)``.
    Returns: ``(soft (X,Y,Z,L) float32, hard (X,Y,Z) int32)``. Either output
    is dead-code-eliminated by XLA when unused.
    """
    rows, c = _packed_label_rows(labels, flow, num_classes)
    w8 = _corner_weights(c - jnp.floor(c))
    sel = _corner_onehot(c)
    hi_p = jax.lax.Precision.HIGHEST
    # labels <= 2**24 are exact in f32 at HIGHEST precision (default-precision
    # dot_general would truncate values > 256 through bf16 passes)
    hard = jnp.einsum(
        "...k,...k->...", rows.astype(jnp.float32), sel, precision=hi_p
    ).astype(jnp.int32)

    @jax.checkpoint
    def mix(rows_, w8_):
        onehot = jax.nn.one_hot(rows_, num_classes, dtype=jnp.float32)
        return jnp.einsum("...kl,...k->...l", onehot, w8_, precision=hi_p)

    return mix(rows, w8), hard


def warp_onehot(labels: jnp.ndarray, flow: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """Trilinear warp of ``one_hot(labels)`` without gathering one-hot data.

    Identity used: linear interpolation of a one-hot field equals the
    corner-weighted sum of the one-hots of the 8 gathered INTEGER labels —
    so only 1 channel is gathered instead of ``num_classes`` (26x less gather
    traffic for the SynthMorph training loss, `train_synthmorph.py:298`).
    The 8 corner labels are packed into one row (see :func:`pack_corners`)
    so a single N-row gather replaces 8. Gradients w.r.t. ``flow`` go through
    the interpolation weights exactly as in the dense formulation (the
    one-hot corner values are constants).

    The (X,Y,Z,8,L) f32 one-hot is ``jax.checkpoint``-ed out of the backward
    residuals (it would be ~4 GB at the training shape).

    Args: ``labels (X,Y,Z)`` int, ``flow (X,Y,Z,3)`` → ``(X,Y,Z,L)`` float32.
    """
    soft, _ = warp_labels_soft_hard(labels, flow, num_classes)
    return soft
