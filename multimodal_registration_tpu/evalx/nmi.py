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


def normalized_mutual_information(image0: np.ndarray, image1: np.ndarray, bins: int = 100) -> float:
    return float(
        _nmi_jit(
            jnp.asarray(np.asarray(image0, np.float32)),
            jnp.asarray(np.asarray(image1, np.float32)),
            bins,
        )
    )
