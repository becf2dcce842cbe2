"""Reshape-based 2x max-pool with a cheap adjoint.

``nn.max_pool`` lowers to ``reduce_window``, whose TPU adjoint is XLA's
SelectAndScatter — a windowed scatter that runs far off the vector units
(benchmarks/unet_bwd_probe.py). For the non-overlapping 2x2x2 window the
pool is expressible as three pair-split reshape+max reductions; its autodiff
adjoint is then a chain of elementwise select/broadcast ops that XLA fuses.

Forward-identical to ``nn.max_pool(x, (2,2,2), (2,2,2))``; gradients differ
only on exact ties between pooled elements (measure-zero for continuous
activations): reduce_max's adjoint splits the cotangent across ties while
SelectAndScatter routes it to the first. Parity target: the pooling between
encoder levels of ``vxm.networks.VxmDense``'s U-Net
(`train_synthmorph.py:276`).
"""

from __future__ import annotations

import jax.numpy as jnp


def max_pool_2x(x):
    """2x2x2/stride-2 max-pool of ``(B, X, Y, Z, C)`` (or unbatched rank-4)."""
    *lead, X, Y, Z, C = x.shape
    x = x.reshape(*lead, X // 2, 2, Y, Z, C).max(axis=-4)
    x = x.reshape(*lead, X // 2, Y // 2, 2, Z, C).max(axis=-3)
    return x.reshape(*lead, X // 2, Y // 2, Z // 2, 2, C).max(axis=-2)
