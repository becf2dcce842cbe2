"""Pallas TPU kernel for the 2x2x2 max-pool ADJOINT.

Every XLA-level formulation of the non-overlapping max-pool backward at
(160,160,192,64) bf16 costs ~80 ms — SelectAndScatter 78.7, elementwise
mask/count 87.4, pair-split autodiff ~equal (benchmarks/unet_bwd_probe.py) —
while the traffic roofline (read x + read g + write grad ≈ 1.4 GB) is
~2-4 ms. The operation is purely local per 2x2x2 window, so a VMEM-tiled
kernel closes the gap: recompute the three pair-max stages inside the tile
and route the cotangent back down with pairwise >=/> selects ("first tie
wins", SelectAndScatter semantics).

Mosaic constraints honored (bisect rounds 2-5, PERF.md): no gathers, no
lane-axis concat, no strided slices, no matmul — only pair-split reshapes
and static slices on SUBLANE axes (the channel lane axis is never touched)
plus elementwise select/max. The layout is NHWC with C minor, so x/y/z pair
splits are all sublane-side.

Parity: gradient of ``nn.max_pool(x, (2,2,2), (2,2,2))`` as used between
U-Net encoder levels (`train_synthmorph.py:276`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _split2(v, axis):
    """(…, 2n, …) -> a=v[…, 0::2, …], b=v[…, 1::2, …] via pair-split reshape
    + static unit slices (strided slices are rejected by this Mosaic)."""
    s = v.shape
    w = v.reshape(*s[:axis], s[axis] // 2, 2, *s[axis + 1:])
    idx_a = (slice(None),) * (axis + 1) + (0,)
    idx_b = (slice(None),) * (axis + 1) + (1,)
    return w[idx_a], w[idx_b]


def _merge2(a, b, axis):
    """Inverse of _split2: interleave a, b along ``axis``."""
    s = a.shape
    w = jnp.stack([a, b], axis=axis + 1)
    return w.reshape(*s[:axis], 2 * s[axis], *s[axis + 1:])


def _route(a, b, g):
    """Adjoint of max(a, b): cotangent to a where a >= b else to b."""
    ge = a >= b
    zero = jnp.zeros((), g.dtype)
    return jnp.where(ge, g, zero), jnp.where(ge, zero, g)


def _kernel(x_ref, g_ref, out_ref):
    x = x_ref[:]          # (FX, FY, Z, C)
    g = g_ref[:]          # (FX/2, FY/2, Z/2, C)

    # forward recompute (pair maxes, all sublane-axis splits)
    xa, xb = _split2(x, 0)
    x1 = jnp.maximum(xa, xb)            # (FX/2, FY, Z, C)
    ya, yb = _split2(x1, 1)
    x2 = jnp.maximum(ya, yb)            # (FX/2, FY/2, Z, C)
    za, zb = _split2(x2, 2)             # (FX/2, FY/2, Z/2, C)

    # backward routing
    g_za, g_zb = _route(za, zb, g)
    g_x2 = _merge2(g_za, g_zb, 2)       # (FX/2, FY/2, Z, C)
    g_ya, g_yb = _route(ya, yb, g_x2)
    g_x1 = _merge2(g_ya, g_yb, 1)       # (FX/2, FY, Z, C)
    g_xa, g_xb = _route(xa, xb, g_x1)
    out_ref[:] = _merge2(g_xa, g_xb, 0).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def max_pool_2x_bwd(x, g, block=(8, 8), interpret: bool = False):
    """Gradient of the 2x stride-2 max-pool w.r.t. ``x``.

    Args:
      x: pool input ``(X, Y, Z, C)`` (even spatial dims).
      g: cotangent of the pooled output ``(X/2, Y/2, Z/2, C)``.
      block: full-res tile ``(fx, fy)``; each program covers full Z and C.

    Returns ``(X, Y, Z, C)`` with SelectAndScatter's first-tie routing.
    """
    X, Y, Z, C = x.shape
    FX, FY = block
    FX, FY = min(FX, X), min(FY, Y)
    assert X % FX == 0 and Y % FY == 0 and FX % 2 == FY % 2 == 0
    assert Z % 2 == 0 and g.shape == (X // 2, Y // 2, Z // 2, C), (
        x.shape, g.shape)
    NX, NY = X // FX, Y // FY

    # block index maps tile (X, Y) directly — no XLA-side reshuffle copies
    return pl.pallas_call(
        _kernel,
        grid=(NX, NY),
        in_specs=[
            pl.BlockSpec((FX, FY, Z, C), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FX // 2, FY // 2, Z // 2, C),
                         lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((FX, FY, Z, C), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((X, Y, Z, C), x.dtype),
        interpret=interpret,
    )(x, g)
