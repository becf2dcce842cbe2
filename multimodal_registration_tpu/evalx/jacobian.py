"""Jacobian-determinant folding analysis of dense deformation fields.

Parity target: `eval_reg_with_jacobian.py:57-91`: 4th-order central
differences (5-point stencil, 2-voxel border trim) of the displacement field,
J = I + ∇φ, det(J) per voxel, % negative determinants (folding), plus
median/mean/std and the detJ volume.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _jacobian_det(ddf: jnp.ndarray):
    """ddf: (X, Y, Z, 3) displacement; returns detJ (X-4, Y-4, Z-4)."""

    def stencil(f, axis):
        sl = [slice(2, -2)] * 3
        out = []
        for off in (-2, -1, 1, 2):
            s = list(sl)
            s[axis] = slice(2 + off, f.shape[axis] - 2 + off or None)
            out.append(f[tuple(s)])
        m2, m1, p1, p2 = out
        return (m2 - 8.0 * m1 + 8.0 * p1 - p2) / 12.0

    dx = stencil(ddf, 0)  # ∂/∂x of each component: (.., 3)
    dy = stencil(ddf, 1)
    dz = stencil(ddf, 2)
    J = jnp.stack([dx, dy, dz], axis=-1)  # (..., comp, deriv)
    J = J + jnp.eye(3)
    # explicit 3x3 determinant (avoids linalg on TPU)
    a, b, c = J[..., 0, 0], J[..., 0, 1], J[..., 0, 2]
    d, e, f = J[..., 1, 0], J[..., 1, 1], J[..., 1, 2]
    g, h, i = J[..., 2, 0], J[..., 2, 1], J[..., 2, 2]
    det = a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)
    return det


def _jacobian_det_host(ddf: np.ndarray) -> np.ndarray:
    """Numpy twin of :func:`_jacobian_det` (same stencil and determinant)."""

    def stencil(f, axis):
        sl = [slice(2, -2)] * 3
        out = []
        for off in (-2, -1, 1, 2):
            s = list(sl)
            s[axis] = slice(2 + off, f.shape[axis] - 2 + off or None)
            out.append(f[tuple(s)])
        m2, m1, p1, p2 = out
        return (m2 - 8.0 * m1 + 8.0 * p1 - p2) / 12.0

    J = np.stack([stencil(ddf, 0), stencil(ddf, 1), stencil(ddf, 2)], axis=-1)
    J = J + np.eye(3, dtype=ddf.dtype)
    a, b, c = J[..., 0, 0], J[..., 0, 1], J[..., 0, 2]
    d, e, f = J[..., 1, 0], J[..., 1, 1], J[..., 1, 2]
    g, h, i = J[..., 2, 0], J[..., 2, 1], J[..., 2, 2]
    return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)


def jacobian_determinant(ddf: np.ndarray) -> np.ndarray:
    """Accepts (X, Y, Z, 3) or the NIfTI field layout (X, Y, Z, 1, 3).

    Host numpy by default — the evaluator's input is a host array in every
    pipeline call site, and a 192-class field upload over the tunnel costs
    ~3 s vs <1 s of streaming stencil math (PERF.md round 4).
    ``MMREG_EVAL_DEVICE=1`` restores the device path."""
    import os

    arr = np.asarray(ddf, np.float32)
    if arr.ndim == 5:
        arr = arr[:, :, :, 0, :]
    if os.environ.get("MMREG_EVAL_DEVICE"):
        return np.asarray(_jacobian_det(jnp.asarray(arr)))
    return _jacobian_det_host(arr)


def folding_summary(ddf: np.ndarray) -> dict:
    det = jacobian_determinant(ddf)
    flat = det.reshape(-1)
    negatives = int(np.count_nonzero(flat < 0))
    return {
        "det": det,
        "percentage_negative_detJa": 100.0 * negatives / flat.size,
        "median_detJa": float(np.median(flat)),
        "mean_detJa": float(np.mean(flat)),
        "std_detJa": float(np.std(flat)),
        "n_total_detJa": int(flat.size),
        "n_negatives_detJa": negatives,
    }
