"""Normalized mutual information (Studholme) via joint histogram, on device.

Parity target: `eval_reg_with_mi.py:16-74`:
  * ``detect_zero_padding`` — bounding box of non-zero mass,
  * ``normalized_mutual_information`` — 100-bin joint histogram binned over
    each image's [min, max] (numpy ``histogramdd`` semantics: right edge of
    the last bin inclusive), NMI = (H0 + H1) / H01 with natural-log entropies.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def detect_zero_padding(im: np.ndarray):
    """(x_min, y_min, z_min, x_max, y_max, z_max) of the non-zero region
    (`eval_reg_with_mi.py:16-35`)."""
    x = np.where(im.sum(axis=(1, 2)) > 0)[0]
    y = np.where(im.sum(axis=(0, 2)) > 0)[0]
    z = np.where(im.sum(axis=(0, 1)) > 0)[0]
    return x[0], y[0], z[0], x[-1], y[-1], z[-1]


@functools.partial(jax.jit, static_argnames=("bins",))
def _nmi_jit(a: jnp.ndarray, b: jnp.ndarray, bins: int):
    def bin_idx(x):
        lo, hi = jnp.min(x), jnp.max(x)
        w = jnp.maximum(hi - lo, 1e-12)
        i = jnp.floor((x - lo) / w * bins).astype(jnp.int32)
        return jnp.clip(i, 0, bins - 1)

    ia, ib = bin_idx(a.reshape(-1)), bin_idx(b.reshape(-1))
    joint = jnp.zeros((bins * bins,), jnp.float32)
    joint = joint.at[ia * bins + ib].add(1.0)
    joint = joint.reshape(bins, bins)

    def entropy(p):
        p = p / jnp.sum(p)
        return -jnp.sum(jnp.where(p > 0, p * jnp.log(p), 0.0))

    h0 = entropy(jnp.sum(joint, axis=0))
    h1 = entropy(jnp.sum(joint, axis=1))
    h01 = entropy(joint.reshape(-1))
    return (h0 + h1) / h01


def _nmi_host(a: np.ndarray, b: np.ndarray, bins: int) -> float:
    """Numpy twin of :func:`_nmi_jit` (identical binning/entropy semantics)."""

    def bin_idx(x):
        x = x.reshape(-1).astype(np.float64)
        lo, hi = x.min(), x.max()
        w = max(hi - lo, 1e-12)
        return np.clip(np.floor((x - lo) / w * bins).astype(np.int64), 0, bins - 1)

    joint = np.bincount(
        bin_idx(a) * bins + bin_idx(b), minlength=bins * bins
    ).astype(np.float64).reshape(bins, bins)

    def entropy(p):
        p = p / p.sum()
        nz = p[p > 0]
        return float(-(nz * np.log(nz)).sum())

    return (entropy(joint.sum(0)) + entropy(joint.sum(1))) / entropy(joint.reshape(-1))


def normalized_mutual_information(image0: np.ndarray, image1: np.ndarray, bins: int = 100) -> float:
    """NMI of two volumes.

    Host numpy by default: the inputs live in host memory in every pipeline
    call site, and on the tunnel-attached TPU the two ~20 MB uploads cost
    ~100x the bincount (PERF.md round 4). ``MMREG_EVAL_DEVICE=1`` restores
    the device joint-histogram path (right choice when volumes are already
    device-resident, e.g. direct-attached deployments)."""
    import os

    if os.environ.get("MMREG_EVAL_DEVICE"):
        return float(
            _nmi_jit(
                jnp.asarray(np.asarray(image0, np.float32)),
                jnp.asarray(np.asarray(image1, np.float32)),
                bins,
            )
        )
    return _nmi_host(np.asarray(image0, np.float32), np.asarray(image1, np.float32), bins)
