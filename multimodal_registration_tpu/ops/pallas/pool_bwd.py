"""Pallas TPU kernel for the 2x2x2 max-pool ADJOINT.

Every XLA-level formulation of the non-overlapping max-pool backward at
(160,160,192,64) bf16 costs ~34-36 ms — SelectAndScatter 34.2, elementwise
mask/count 36.2 (benchmarks/pool_bwd_probe.py) — while the traffic roofline
(read x + read g + write grad ≈ 1.4 GB) is ~2-4 ms. The operation is purely
local per 2x2x2 window, so a VMEM-tiled kernel closes the gap: recompute the
pair-max stages inside the tile and route the cotangent back with pairwise
>=/> selects ("first tie wins", SelectAndScatter semantics).

Mosaic constraints honored (bisect rounds 2-5 + two probe rounds, PERF.md):
no gathers, no matmul, no strided slices, no bf16 vector compares (cast to
f32: "Target does not support this comparison"), and NO reshapes that touch
the two minor (sublane/lane) axes — ``tpu.reshape`` splitting or inserting
dims next to the lane axis is an "unsupported shape cast". The z axis is
therefore pair-split OUTSIDE the kernel (XLA even/odd strided slices); the
kernel sees ``xe``/``xo`` half-z volumes, does x/y pair splits on LEADING
axes only, routes the z pair elementwise, and writes two half-z gradient
outputs that XLA re-interleaves. The three XLA-side passes are plain
slice/stack copies (~2-4 ms total at this size).

Parity: gradient of ``nn.max_pool(x, (2,2,2), (2,2,2))`` as used between
U-Net encoder levels (`train_synthmorph.py:276`).

HARDWARE VERDICT (round 3d, PERF.md): isolated, v2 measures 32.0 ms vs
SelectAndScatter's 35.7 at (160,160,192,64) bf16; but the FULL train step
with the kernel enabled regresses 478.8 -> 503.5 ms — the layout copies at
the pallas_call boundary and the z-repeat cotangent prep cost more than the
adjoint saves once XLA can no longer fuse around the pool backward. The
kernel therefore stays env-gated (``MMREG_PALLAS_POOL_BWD=1``) and OFF by
default; the XLA mask/count adjoint in ``ops/pool.py`` is production.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fit_even_divisor(n, want):
    """Largest EVEN divisor of ``n`` not exceeding ``want`` (tiles must hold
    whole pool windows); ``n`` is even for any pool input."""
    for d in range(min(want, n), 1, -1):
        if d % 2 == 0 and n % d == 0:
            return d
    return 2


def _split2_lead(v, axis):
    """Pair-split along a LEADING axis (axis < v.ndim - 2): reshape + static
    unit slices. Never touches the sublane/lane axes."""
    s = v.shape
    w = v.reshape(*s[:axis], s[axis] // 2, 2, *s[axis + 1:])
    idx_a = (slice(None),) * (axis + 1) + (0,)
    idx_b = (slice(None),) * (axis + 1) + (1,)
    return w[idx_a], w[idx_b]


def _merge2_lead(a, b, axis):
    """Interleave along a LEADING axis (inverse of _split2_lead)."""
    s = a.shape
    w = jnp.stack([a, b], axis=axis + 1)
    return w.reshape(*s[:axis], 2 * s[axis], *s[axis + 1:])


def _route(a, b, g):
    """Adjoint of max(a, b): cotangent to a where a >= b else to b.

    Compares run in f32 — this Mosaic rejects bf16 vector comparisons."""
    ge = a.astype(jnp.float32) >= b.astype(jnp.float32)
    zero = jnp.zeros((), g.dtype)
    return jnp.where(ge, g, zero), jnp.where(ge, zero, g)


def _kernel(xe_ref, xo_ref, g_ref, ge_ref, go_ref):
    xe = xe_ref[:]        # (FX, FY, Z/2, C) — even-z planes
    xo = xo_ref[:]        # (FX, FY, Z/2, C) — odd-z planes
    g = g_ref[:]          # (FX/2, FY/2, Z/2, C)

    # forward recompute: z pair first (elementwise), then x/y pair maxes on
    # leading axes
    mz = jnp.maximum(xe, xo)            # (FX, FY, Z/2, C)
    xa, xb = _split2_lead(mz, 0)
    mx = jnp.maximum(xa, xb)            # (FX/2, FY, Z/2, C)
    ya, yb = _split2_lead(mx, 1)

    # backward routing (reverse order)
    g_ya, g_yb = _route(ya, yb, g)
    g_mx = _merge2_lead(g_ya, g_yb, 1)  # (FX/2, FY, Z/2, C)
    g_xa, g_xb = _route(xa, xb, g_mx)
    g_mz = _merge2_lead(g_xa, g_xb, 0)  # (FX, FY, Z/2, C)
    g_e, g_o = _route(xe, xo, g_mz)     # elementwise z routing
    ge_ref[:] = g_e.astype(ge_ref.dtype)
    go_ref[:] = g_o.astype(go_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def max_pool_2x_bwd(x, g, block=(8, 8), interpret: bool = False):
    """Gradient of the 2x stride-2 max-pool w.r.t. ``x``.

    Args:
      x: pool input ``(X, Y, Z, C)`` (even spatial dims).
      g: cotangent of the pooled output ``(X/2, Y/2, Z/2, C)``.
      block: full-res tile ``(fx, fy)``; each program covers full Z/2 and C.

    Returns ``(X, Y, Z, C)`` with SelectAndScatter's first-tie routing.
    """
    X, Y, Z, C = x.shape
    FX, FY = _fit_even_divisor(X, block[0]), _fit_even_divisor(Y, block[1])
    assert X % 2 == Y % 2 == Z % 2 == 0 and g.shape == (
        X // 2, Y // 2, Z // 2, C), (x.shape, g.shape)
    NX, NY = X // FX, Y // FY
    Zh = Z // 2

    # z pair split on the XLA side (in-kernel z reshapes are unsupported
    # layout casts on this backend)
    xs = x.reshape(X, Y, Zh, 2, C)
    xe, xo = xs[:, :, :, 0], xs[:, :, :, 1]

    half = pl.BlockSpec((FX, FY, Zh, C), lambda i, j: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)
    ge, go = pl.pallas_call(
        _kernel,
        grid=(NX, NY),
        in_specs=[half, half,
                  pl.BlockSpec((FX // 2, FY // 2, Zh, C),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[half, half],
        out_shape=[jax.ShapeDtypeStruct((X, Y, Zh, C), x.dtype)] * 2,
        interpret=interpret,
    )(xe, xo, g)

    # re-interleave the two half-z gradients (one XLA pass)
    return jnp.stack([ge, go], axis=3).reshape(X, Y, Z, C)


# --- v3: roll-based z pairing — no XLA-side split/interleave of x ----------
#
# v2 measured 29.7 ms at (160,160,192,64) vs XLA's 34.4 — the win is eaten
# by the two XLA passes it added: x -> (xe, xo) even/odd split (0.9 GB read
# + 0.9 GB write) and the final stack/interleave (again ~1.8 GB). v3 keeps
# x and the output at FULL z inside the kernel and pairs z voxels with
# ``pltpu.roll`` (sublane rotate) + an iota parity select, so the only
# XLA-side prep is a z-repeat of the QUARTER-size cotangent g
# (0.23 GB read + 0.45 GB write). Kernel traffic: read x (0.9) + gz (0.45)
# + write grad (0.9) = 2.26 GB vs v2's effective ~5.5 GB.
#
# Tie semantics match v2 exactly: the pair tournament is z-first, then x,
# then y, with the lower index winning ties at every stage ("first tie
# wins" per stage; one routed winner per window).


def _kernel_v3(x_ref, gz_ref, out_ref):
    xf = x_ref[:].astype(jnp.float32)   # (FX, FY, Z, C); f32: Mosaic rejects
    gz = gz_ref[:]                      # (FX/2, FY/2, Z, C)  bf16 compares
    zi = jax.lax.broadcasted_iota(jnp.int32, xf.shape, 2)
    even = (zi % 2) == 0
    # partner of z is z+1 at even z, z-1 at odd z (block z == full z, so the
    # roll wrap-around never crosses a pair boundary; pltpu.roll requires a
    # non-negative shift, so -1 is expressed as Z-1)
    Z = xf.shape[2]
    partner = jnp.where(even, pltpu.roll(xf, Z - 1, 2), pltpu.roll(xf, 1, 2))
    mz = jnp.maximum(xf, partner)       # per-voxel pair max (duplicated in z)

    xa, xb = _split2_lead(mz, 0)
    mx = jnp.maximum(xa, xb)            # (FX/2, FY, Z, C)
    ya, yb = _split2_lead(mx, 1)

    g_ya, g_yb = _route(ya, yb, gz)
    g_mx = _merge2_lead(g_ya, g_yb, 1)  # (FX/2, FY, Z, C)
    g_xa, g_xb = _route(xa, xb, g_mx)
    g_mz = _merge2_lead(g_xa, g_xb, 0)  # (FX, FY, Z, C): the window's
    # cotangent, duplicated across each z pair — route it to the z winner
    # (even index wins ties: >= for even, strict > for odd). NOT
    # ``where(even, ge, gt)``: selecting between two BOOLEAN vectors makes
    # XLA's i8 bools meet Mosaic's i1 masks in an unsupported `arith.trunci
    # i8 -> i1` (hardware probe); compose the condition with logical ops
    # on the compare results instead.
    win = (xf > partner) | ((xf >= partner) & even)
    zero = jnp.zeros((), g_mz.dtype)
    out_ref[:] = jnp.where(win, g_mz, zero).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def max_pool_2x_bwd_v3(x, g, block=(2, 8), interpret: bool = False):
    """Roll-based pool adjoint: one kernel pass, full-z blocks.

    Same contract as :func:`max_pool_2x_bwd`; ``block`` is the full-res
    ``(fx, fy)`` tile, each program covers full Z and C.
    """
    X, Y, Z, C = x.shape
    assert X % 2 == Y % 2 == Z % 2 == 0 and g.shape == (
        X // 2, Y // 2, Z // 2, C), (x.shape, g.shape)
    FX, FY = _fit_even_divisor(X, block[0]), _fit_even_divisor(Y, block[1])
    NX, NY = X // FX, Y // FY

    gz = jnp.repeat(g, 2, axis=2)       # (X/2, Y/2, Z, C) — quarter-size pass

    return pl.pallas_call(
        _kernel_v3,
        grid=(NX, NY),
        in_specs=[
            pl.BlockSpec((FX, FY, Z, C), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FX // 2, FY // 2, Z, C), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((FX, FY, Z, C), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((X, Y, Z, C), x.dtype),
        interpret=interpret,
    )(x, gz)
