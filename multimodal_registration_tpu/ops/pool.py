"""2x max-pool with a reduce_window forward and a cheap elementwise adjoint.

``nn.max_pool`` lowers to ``reduce_window`` — the right FORWARD (one fused
pass) — but its TPU adjoint is XLA's SelectAndScatter, a windowed scatter
that runs far off the vector units: at (160,160,192,64) bf16 the probe puts
conv+pool backward at 78.9 ms vs 10.0 ms for the conv alone
(benchmarks/unet_bwd_probe.py). For the non-overlapping 2x2x2 window the
adjoint is expressible directly: broadcast the pooled max and cotangent back
to full resolution, mask where the input equals its window max, and split
the cotangent equally among ties — exactly ``lax.reduce_max``'s transpose
semantics, but as a chain of elementwise ops XLA fuses.

So ``max_pool_2x`` is a ``jax.custom_vjp``: reduce_window forward (identical
to ``nn.max_pool(x, (2,2,2), (2,2,2))``), elementwise backward. Gradients
differ from SelectAndScatter only on exact ties (which routes everything to
the first tie; measure-zero for continuous activations).

Parity target: the pooling between encoder levels of
``vxm.networks.VxmDense``'s U-Net (`train_synthmorph.py:276`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _pool_fwd_raw(x):
    dims = (1,) * (x.ndim - 4) + (2, 2, 2, 1)
    return lax.reduce_window(x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
                             else jnp.iinfo(x.dtype).min,
                             lax.max, dims, dims, "VALID")


def _upsample_nearest_2x(v):
    """Repeat each pooled voxel over its 2x2x2 window (spatial axes -4..-2)."""
    for ax in (-4, -3, -2):
        v = jnp.repeat(v, 2, axis=ax)
    return v


@jax.custom_vjp
def max_pool_2x(x):
    """2x2x2/stride-2 max-pool of ``(..., X, Y, Z, C)`` (rank 4 or 5)."""
    return _pool_fwd_raw(x)


def _fwd(x):
    y = _pool_fwd_raw(x)
    return y, (x, y)


def _pallas_pool_bwd_enabled() -> bool:
    import os

    if os.environ.get("MMREG_PALLAS_POOL_BWD", "0") != "1":
        return False
    # the kernel is TPU-only (Mosaic); on other backends fall through to the
    # XLA adjoint rather than failing in pallas_call
    return jax.default_backend() not in ("cpu", "gpu")


def _bwd(res, g):
    x, y = res
    spatial = x.shape[-4:-1]
    if any(s % 2 for s in spatial):
        # VALID pooling ignores the trailing element of odd spatial dims
        # (zero gradient there, matching nn.max_pool's adjoint): crop to
        # even, recurse, zero-pad back.
        even = tuple(s - s % 2 for s in spatial)
        sl = (Ellipsis,) + tuple(slice(0, e) for e in even) + (slice(None),)
        (gx,) = _bwd((x[sl], y), g)
        pads = [(0, 0)] * (x.ndim - 4) + [
            (0, s - e) for s, e in zip(spatial, even)
        ] + [(0, 0)]
        return (jnp.pad(gx, pads),)
    if _pallas_pool_bwd_enabled() and x.ndim in (4, 5) and (
        x.ndim == 4 or x.shape[0] == 1
    ):
        # VMEM-tiled adjoint kernel (v3: roll-based z pairing) — the XLA
        # formulations measure ~34-36 ms at (160,160,192,64) vs the kernel's
        # single-pass traffic (PERF.md round 3c)
        from multimodal_registration_tpu.ops.pallas.pool_bwd import (
            max_pool_2x_bwd_v3,
        )

        if x.ndim == 5:
            return (max_pool_2x_bwd_v3(x[0], g[0])[None].astype(x.dtype),)
        return (max_pool_2x_bwd_v3(x, g).astype(x.dtype),)
    yb = _upsample_nearest_2x(y)
    gb = _upsample_nearest_2x(g)
    mask = (x == yb)
    # equal split among in-window ties (reduce_max transpose semantics)
    cnt = _pool_fwd_sum(mask.astype(g.dtype))
    cntb = _upsample_nearest_2x(cnt)
    grad = jnp.where(mask, gb / cntb, jnp.zeros((), g.dtype))
    return (grad.astype(x.dtype),)


def _pool_fwd_sum(m):
    dims = (1,) * (m.ndim - 4) + (2, 2, 2, 1)
    return lax.reduce_window(m, jnp.zeros((), m.dtype), lax.add, dims, dims,
                             "VALID")


max_pool_2x.defvjp(_fwd, _bwd)
