"""Z-line row-reduction trilinear warp (the round-3 gather lever).

The packed warp (`ops/warp.py`) gathers ONE row per output voxel — V rows at
~110-230 M rows/s is the dominant cost of the forward (PERF.md). This module
amortizes a gathered row over a whole LINE of output voxels along z, valid
when the flow is locally smooth (true for diffeomorphic inference fields and
every scaling-and-squaring step, where flows are ``svf / 2^k``):

  * pack the 3x3 xy corner neighborhood of every voxel (9 edge-padded shifted
    copies) and block the z axis into ``zb``-plane rows:
    ``R[(x*Y + y)*Zb + zblk] = vol[x+dx, y+dy, zblk*zb : (zblk+1)*zb]`` for
    ``(dx, dy) in {0,1,2}^2`` — one row = (zb, 9C) values,
  * per output z-line of ``g`` voxels, gather TWO consecutive z-block rows
    (a 2*zb-deep window) at the line's shared xy corner base — V/g lines x 2
    rows instead of V rows (g/2-fold row reduction, ~4x padded-byte
    reduction),
  * per voxel, trilinear weights become two banded one-hot contractions over
    the window: z (2 taps over 2*zb) then xy (4 taps over 9).

Validity guards (checked at runtime, reduced over the volume; on failure a
``lax.cond`` falls back to the caller-provided exact path):
  * per line, ``max(floor(cx)) - min(floor(cx)) <= 1`` and same for y — the
    3-wide xy window then covers every voxel's 2x2 corner set,
  * per line, all z taps fall inside the gathered 2*zb window.

Reference semantics preserved exactly: edge-clamped sampling, ``x1 =
min(x0+1, X-1)`` corner clamping (`bids_registration.py:335` /
`train_synthmorph.py:298` SpatialTransformer parity).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from multimodal_registration_tpu.ops.grid import identity_grid


def _pack9_zblocks(vol: jnp.ndarray, zb: int, payload_dtype=None) -> jnp.ndarray:
    """(X, Y, Z, C) -> (X*Y*Zb, zb*9C) rows of 3x3-xy-corner z-blocks."""
    X, Y, Z, C = vol.shape
    if payload_dtype is not None:
        vol = vol.astype(payload_dtype)
    vp = jnp.pad(vol, ((0, 2), (0, 2), (0, 0), (0, 0)), mode="edge")
    corners = [
        vp[dx:dx + X, dy:dy + Y]
        for dx in range(3)
        for dy in range(3)
    ]  # 9 x (X, Y, Z, C)
    p9 = jnp.stack(corners, axis=-2)  # (X, Y, Z, 9, C)
    Zb = Z // zb
    # row-major: (X, Y, Zb, zb, 9, C) -> rows (X*Y*Zb, zb*9C)
    return p9.reshape(X, Y, Zb, zb, 9 * C).reshape(X * Y * Zb, zb * 9 * C)


def _band2(idx0, idx1, w1, width):
    """Two-tap banded weights over a ``width`` window: ``(1-w1)`` at idx0,
    ``w1`` at idx1 (idx0 == idx1 accumulates — the clamped-corner case)."""
    j = jax.lax.broadcasted_iota(jnp.int32, (*idx0.shape, width), idx0.ndim)
    return ((j == idx0[..., None]) * (1.0 - w1)[..., None]
            + (j == idx1[..., None]) * w1[..., None]).astype(jnp.float32)


def _zline_body(vol, c, g, zb, payload_dtype):
    X, Y, Z, C = vol.shape
    K = Z // g
    Zb = Z // zb

    i0 = jnp.floor(c).astype(jnp.int32)            # (X, Y, Z, 3)
    f = (c - jnp.floor(c)).astype(jnp.float32)
    dims = jnp.array([X - 1, Y - 1, Z - 1], jnp.int32)
    i1 = jnp.minimum(i0 + 1, dims)                 # clamped far corners

    # per-line shared xy base (min floor over the line)
    x0 = i0[..., 0].reshape(X, Y, K, g)
    y0 = i0[..., 1].reshape(X, Y, K, g)
    z0 = i0[..., 2].reshape(X, Y, K, g)
    x0b = jnp.min(x0, axis=-1)                     # (X, Y, K)
    y0b = jnp.min(y0, axis=-1)
    B = jnp.clip(jnp.min(z0, axis=-1) // zb, 0, Zb - 2)

    rows = _pack9_zblocks(vol, zb, payload_dtype)  # (X*Y*Zb, zb*9C)
    lin = (x0b * Y + y0b) * Zb + B                 # (X, Y, K)
    r0 = jnp.take(rows, lin.reshape(-1), axis=0)
    r1 = jnp.take(rows, (lin + 1).reshape(-1), axis=0)
    win = jnp.concatenate([r0, r1], axis=-1).reshape(
        X, Y, K, 2 * zb, 9, C
    ).astype(jnp.float32)

    # z contraction: 2 taps over the 2*zb window
    rz0 = z0 - (B * zb)[..., None]
    rz1 = i1[..., 2].reshape(X, Y, K, g) - (B * zb)[..., None]
    wz = _band2(rz0, rz1, f[..., 2].reshape(X, Y, K, g), 2 * zb)
    hi = jax.lax.Precision.HIGHEST
    # (X,Y,K,g,2zb) x (X,Y,K,2zb,9,C) -> (X,Y,K,g,9,C)
    A = jnp.einsum("xykgw,xykwnc->xykgnc", wz, win, precision=hi)

    # xy contraction: banded 3-wide windows, outer product -> 9
    wx = _band2(x0 - x0b[..., None],
                i1[..., 0].reshape(X, Y, K, g) - x0b[..., None],
                f[..., 0].reshape(X, Y, K, g), 3)
    wy = _band2(y0 - y0b[..., None],
                i1[..., 1].reshape(X, Y, K, g) - y0b[..., None],
                f[..., 1].reshape(X, Y, K, g), 3)
    wxy = (wx[..., :, None] * wy[..., None, :]).reshape(X, Y, K, g, 9)
    out = jnp.einsum("xykgn,xykgnc->xykgc", wxy, A, precision=hi)
    return out.reshape(X, Y, Z, C)


def _guards_ok(c, g, zb, X, Y, Z):
    """Volume-global validity of the z-line fast path for clipped coords."""
    K = Z // g
    Zb = Z // zb
    i0 = jnp.floor(c).astype(jnp.int32)
    x0 = i0[..., 0].reshape(X, Y, K, g)
    y0 = i0[..., 1].reshape(X, Y, K, g)
    z0 = i0[..., 2].reshape(X, Y, K, g)
    gx = (jnp.max(x0, axis=-1) - jnp.min(x0, axis=-1)) <= 1
    gy = (jnp.max(y0, axis=-1) - jnp.min(y0, axis=-1)) <= 1
    B = jnp.clip(jnp.min(z0, axis=-1) // zb, 0, Zb - 2)
    zhi = jnp.minimum(jnp.max(z0, axis=-1) + 1, Z - 1)
    gz = zhi <= (B + 2) * zb - 1
    return jnp.all(gx & gy & gz)


# Max bytes per gathered row (zb * 9C values x payload itemsize). Gather
# throughput is governed by the packed source's PADDED width (CLAUDE.md /
# PERF.md round 2b), so a row must stay within a few 128-lane tiles; beyond
# the budget the packed design loses to the flat per-voxel path and the
# caller should fall back.
ZLINE_ROW_BYTE_BUDGET = 4096


def zline_plan(Z: int, C: int, itemsize: int):
    """Pick (g, zb) for the z-line path, or None to fall back.

    ``itemsize`` is the PAYLOAD itemsize (reduced when ``payload_dtype`` is
    set). None when Z doesn't block evenly, lines would be too short to
    amortize the row gather, or ``zb * 9C * itemsize`` exceeds
    :data:`ZLINE_ROW_BYTE_BUDGET` even at the smallest block."""
    if os.environ.get("MMREG_ZLINE_WARP", "1") == "0":
        return None
    for zb in (16, 8):  # g == zb: line length == z-block depth
        if Z % zb or Z // zb < 2:
            continue
        if zb * 9 * C * itemsize > ZLINE_ROW_BYTE_BUDGET:
            continue
        return zb, zb
    return None


def warp_zline(vol: jnp.ndarray, flow: jnp.ndarray, fallback=None,
               payload_dtype=None) -> jnp.ndarray:
    """Trilinear warp via the z-line row-reduction path with a runtime guard.

    Args:
      vol: ``(X, Y, Z, C)`` or ``(X, Y, Z)``.
      flow: ``(X, Y, Z, 3)`` displacement.
      fallback: exact path taking ``(vol, flow)`` when guards fail; defaults
        to :func:`multimodal_registration_tpu.ops.warp.warp`.
      payload_dtype: reduced dtype for gathered values (coords/weights stay
        f32), e.g. ``jnp.bfloat16``.
    """
    squeeze = vol.ndim == 3
    v4 = vol[..., None] if squeeze else vol
    X, Y, Z, C = v4.shape
    itemsize = jnp.dtype(payload_dtype if payload_dtype is not None
                         else v4.dtype).itemsize
    plan = zline_plan(Z, C, itemsize)
    if fallback is None:
        from multimodal_registration_tpu.ops.warp import warp as _warp

        fallback = functools.partial(_warp, interp="linear")
    if plan is None:
        out = fallback(v4, flow)
        return out[..., 0] if squeeze else out

    g, zb = plan
    grid = identity_grid((X, Y, Z), dtype=jnp.float32)
    c = jnp.clip(grid + flow.astype(jnp.float32), 0.0,
                 jnp.array([X - 1, Y - 1, Z - 1], jnp.float32))
    # checkpoint: reverse-mode AD would otherwise keep the gathered window
    # tensor (lines x 2zb x 9C f32) as a residual — recomputing the row
    # gather in the backward costs one extra pass and ~zero memory (same
    # policy as the chunked warp's per-slab checkpoint).
    body = jax.checkpoint(
        lambda v, cc: _zline_body(v, cc, g, zb, payload_dtype))
    out = jax.lax.cond(
        _guards_ok(c, g, zb, X, Y, Z),
        lambda _: body(v4, c).astype(v4.dtype),
        lambda _: fallback(v4, flow).astype(v4.dtype),
        0,
    )
    return out[..., 0] if squeeze else out


def warp_zline_batch(vol, flow, payload_dtype=None):
    """Batched z-line warp: ``vol (B,X,Y,Z[,C])``, ``flow (B,X,Y,Z,3)``.

    NOT ``vmap(warp_zline)`` — vmap would turn the guard ``lax.cond`` into a
    both-branches select (the measured trap of the chunked warp, PERF.md).
    The guard is reduced over the whole batch and the cond sits ABOVE the
    vmap; the fallback is :func:`ops.warp.warp_batch` (which hoists its own
    halo cond the same way).
    """
    from multimodal_registration_tpu.ops.warp import warp_batch

    squeeze = vol.ndim == 4
    v5 = vol[..., None] if squeeze else vol
    B, X, Y, Z, C = v5.shape
    itemsize = jnp.dtype(payload_dtype if payload_dtype is not None
                         else v5.dtype).itemsize
    plan = zline_plan(Z, C, itemsize)
    if plan is None:
        out = warp_batch(v5, flow, "linear")
        return out[..., 0] if squeeze else out

    g, zb = plan
    grid = identity_grid((X, Y, Z), dtype=jnp.float32)
    c = jnp.clip(grid[None] + flow.astype(jnp.float32), 0.0,
                 jnp.array([X - 1, Y - 1, Z - 1], jnp.float32))
    ok = jnp.all(jax.vmap(lambda cc: _guards_ok(cc, g, zb, X, Y, Z))(c))
    body = jax.checkpoint(
        lambda v, cc: _zline_body(v, cc, g, zb, payload_dtype))
    out = jax.lax.cond(
        ok,
        lambda _: jax.vmap(body)(v5, c).astype(v5.dtype),
        lambda _: warp_batch(v5, flow, "linear").astype(v5.dtype),
        0,
    )
    return out[..., 0] if squeeze else out


def compose_fields_zline_batch(phi1, phi2, payload_dtype=None):
    """Batched field compose via the z-line warp.

    ``phi(x) = phi2(x) + phi1(x + phi2(x))`` — the gather COORDINATES come
    from ``phi2`` alone (in training that is the model flow: smooth, ~1
    voxel), so the z-line guard typically holds even when ``phi1`` (the
    generator field, ~10 voxels) is rough; guard failure falls back to the
    exact batched warp. Same contract as
    :func:`multimodal_registration_tpu.ops.field.compose_fields_batch`
    (parity: ``vxm.utils.compose``, `bids_two_steps_registration.py:324`);
    ``payload_dtype`` casts only the gathered ``phi1`` values (coordinates
    and the ``+ phi2`` accumulation stay f32), mirroring the trainer's
    ``compose_payload_dtype`` contract.
    """
    inc = warp_zline_batch(phi1, phi2, payload_dtype=payload_dtype)
    return phi2.astype(jnp.float32) + inc.astype(jnp.float32)


def integrate_svf_zline_batch(vel, int_steps: int, payload_dtype=None):
    """Batched scaling-and-squaring with z-line warps in the squaring body.

    ``vel (B, X, Y, Z, 3)``. Each step's flow is ``svf / 2^(k-i)`` — small and
    smooth, the ideal z-line case; the per-step guard still falls back to the
    exact batched warp when violated. Parity: ``vxm.layers.VecInt``
    (`config/README.md:52-53`), same contract as
    :func:`multimodal_registration_tpu.ops.integrate.integrate_svf`.
    """
    if int_steps <= 0:
        return vel
    phi = vel.astype(jnp.float32) / (2.0**int_steps)

    def body(_, p):
        # payload_dtype reaches only the gathered values (pack9 cast);
        # coordinates, weights, and the accumulator stay float32 — the same
        # contract as integrate_svf's payload (fallback stays full f32).
        inc = warp_zline_batch(p, p, payload_dtype=payload_dtype)
        return p + inc.astype(jnp.float32)

    return jax.lax.fori_loop(0, int_steps, body, phi)
