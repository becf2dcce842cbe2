"""Fused first-conv + LeakyReLU + 2x max-pool Pallas kernel.

Motivation (PERF.md conv attribution): the U-Net's first conv (2->64 at
192^3, bf16) runs at 2.4 TFLOP/s under XLA — bound by the 906 MB full-res
activation write, not FLOPs — and with ``svf_res>=2`` that activation's skip
connection is NEVER consumed (`models/unet.py`: the decoder stops one level
short, so enc_0's full-res output feeds ONLY the max-pool). Fusing
conv + LeakyReLU(0.2) + maxpool(2) writes the half-res pooled tensor
directly: ~150 MB of HBM traffic instead of ~1.9 GB.

Kernel design (per the TPU kernel guide):
  * input stays in HBM (pl.ANY); each grid step DMAs an overlapping
    (2bx+2, 2by+2, Z+2, Cin) halo block into VMEM scratch (overlapping
    blocks are not expressible with BlockSpec index maps, hence manual DMA),
  * the 27-tap 3^3 conv becomes ONE MXU matmul per tile: 27 shifted static
    slices of the halo block are concatenated into an im2col block
    (vox, 27*Cin), multiplied by the (27*Cin, Cout) reshaped weights,
  * LeakyReLU and the 2x2x2 max-pool run in VMEM registers (strided-slice
    maxes), and only the pooled (bx, by, Z/2, Cout) tile is written.

Reference op being accelerated: the first encoder level of
``vxm.networks.VxmDense``'s U-Net (`train_synthmorph.py:276`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_hbm, w_ref, b_ref, out_ref, xs, sem, *, BX, BY, Z, Cin, Cout,
            neg_slope):
    i = pl.program_id(0)
    j = pl.program_id(1)
    fx, fy = 2 * BX, 2 * BY  # full-res tile extent served by this program

    # halo block: (fx+2, fy+2, Z+2, Cin) from the pre-padded input
    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(i * fx, fx + 2), pl.ds(j * fy, fy + 2)], xs, sem
    )
    dma.start()
    dma.wait()

    # im2col: 27 shifted slices -> (fx, fy, Z, 27*Cin)
    taps = []
    for dx in range(3):
        for dy in range(3):
            for dz in range(3):
                taps.append(xs[dx:dx + fx, dy:dy + fy, dz:dz + Z, :])
    im2col = jnp.concatenate(taps, axis=-1).reshape(fx * fy * Z, 27 * Cin)

    acc = jnp.dot(im2col, w_ref[:], preferred_element_type=jnp.float32)
    acc = acc + b_ref[:].astype(jnp.float32)
    acc = jnp.where(acc >= 0, acc, neg_slope * acc)
    full = acc.reshape(fx, fy, Z, Cout)

    # 2x max-pool via pairwise strided maxes (no sublane-hostile reshapes)
    p = jnp.maximum(full[0::2], full[1::2])          # x
    p = jnp.maximum(p[:, 0::2], p[:, 1::2])          # y
    p = jnp.maximum(p[:, :, 0::2], p[:, :, 1::2])    # z
    out_ref[:] = p.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("neg_slope", "block", "out_dtype")
)
def conv3_lrelu_pool(x, w, b, neg_slope: float = 0.2, block=(2, 8),
                     out_dtype=jnp.bfloat16):
    """``maxpool2(leaky_relu(conv3x3x3(x, w) + b))`` without materializing the
    full-resolution activation.

    Args:
      x: ``(X, Y, Z, Cin)`` input (any float dtype; computed in bf16 on MXU).
      w: ``(3, 3, 3, Cin, Cout)`` HWIO conv kernel.
      b: ``(Cout,)`` bias.
      block: pooled-output tile ``(bx, by)``; each program covers the full Z.

    Returns ``(X/2, Y/2, Z/2, Cout)``.
    """
    X, Y, Z, Cin = x.shape
    Cout = w.shape[-1]
    BX, BY = block
    assert X % (2 * BX) == 0 and Y % (2 * BY) == 0 and Z % 2 == 0

    xp = jnp.pad(x, ((1, 1), (1, 1), (1, 1), (0, 0))).astype(jnp.bfloat16)
    w2 = w.reshape(27 * Cin, Cout).astype(jnp.bfloat16)
    b2 = b.reshape(1, Cout).astype(jnp.float32)

    fx, fy = 2 * BX, 2 * BY
    grid = (X // fx, Y // fy)
    kern = functools.partial(
        _kernel, BX=BX, BY=BY, Z=Z, Cin=Cin, Cout=Cout, neg_slope=neg_slope
    )
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # halo-DMA'd manually
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (BX, BY, Z // 2, Cout),
            lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((X // 2, Y // 2, Z // 2, Cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((fx + 2, fy + 2, Z + 2, Cin), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(xp, w2, b2)


def conv3_lrelu_pool_reference(x, w, b, neg_slope: float = 0.2):
    """Plain-XLA reference (conv -> leaky -> pool), for equivalence tests."""
    out = jax.lax.conv_general_dilated(
        x[None].astype(jnp.float32), w.astype(jnp.float32),
        window_strides=(1, 1, 1), padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )[0] + b
    out = jnp.where(out >= 0, out, neg_slope * out)
    return jax.lax.reduce_window(
        out, -jnp.inf, jax.lax.max, (2, 2, 2, 1), (2, 2, 2, 1), "VALID"
    )
