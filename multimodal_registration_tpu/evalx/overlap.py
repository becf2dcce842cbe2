"""Segmentation-overlap metrics (device kernels).

Parity target: `eval_reg_on_sc_seg.py:75-124` — confusion counts of a binary
segmentation against the fixed segmentation, and the derived Dice / Jaccard /
sensitivity / specificity / accuracy / precision. The reference's precision
quirk is preserved: it divides TP by the TOTAL number of SC voxels in the
evaluated segmentation (`:119-120`), which equals TP+FP only for binary masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _confusion(fx: jnp.ndarray, seg: jnp.ndarray):
    fx1 = fx == 1
    tp = jnp.sum(jnp.where(fx1, seg, 0.0))
    fp = jnp.sum(jnp.where(~fx1, seg, 0.0))
    n_bg = jnp.sum(~fx1)
    tn = n_bg - fp
    n_fg = jnp.sum(fx1)
    fn = n_fg - tp
    return tp, fp, tn, fn


def overlap_metrics(fx_seg: np.ndarray, seg: np.ndarray) -> dict:
    fx = jnp.asarray(np.asarray(fx_seg, np.float32))
    sg = jnp.asarray(np.asarray(seg, np.float32))
    tp, fp, tn, fn = (float(x) for x in _confusion(fx, sg))
    nb_vox = float(np.prod(seg.shape))
    nb_sc_vox = float(np.sum(seg))
    return {
        "tp": tp,
        "fp": fp,
        "tn": tn,
        "fn": fn,
        "dice": (2 * tp) / (tp + tp + fp + fn) if (tp + fp + fn) else 0.0,
        "jaccard": tp / (tp + fp + fn) if (tp + fp + fn) else 0.0,
        "sensitivity": tp / (tp + fn) if (tp + fn) else 0.0,
        "specificity": tn / (tn + fp) if (tn + fp) else 0.0,
        "accuracy": (tp + tn) / nb_vox,
        "precision": tp / nb_sc_vox if nb_sc_vox else 0.0,
    }
