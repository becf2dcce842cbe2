"""Fused first-conv + LeakyReLU + 2x max-pool Pallas kernel.

Motivation (PERF.md conv attribution): the U-Net's first conv (2->64 at
192^3, bf16) runs at 2.4 TFLOP/s under XLA — bound by the 906 MB full-res
activation write, not FLOPs — and with ``svf_res>=2`` that activation's skip
connection is NEVER consumed (`models/unet.py`: the decoder stops one level
short, so enc_0's full-res output feeds ONLY the max-pool). Fusing
conv + LeakyReLU(0.2) + maxpool(2) writes the half-res pooled tensor
directly: ~150 MB of HBM traffic instead of ~1.9 GB.

STATUS (bisect round 5, 2026-08-17): interpret-validated but does NOT
compile on this hardware backend. Every im2col variant (bf16/f32 scratch,
K=54/64, 4-D/2-D scratch, single matmul / 54 rank-1 updates) dies on the
same op — ``tpu.reshape vector<54x4x16x192> -> vector<54x12288>``
("infer-vector-layout: unsupported shape cast"): merging sublane spatial
dims into the lane axis is unsupported, and an im2col conv requires that
flatten. Keep opt-in (MMREG_FUSED_FIRST_CONV) for backends whose Mosaic
accepts it; the XLA conv path is the supported default. Full probe history
in PERF.md round 3c.

Kernel design, v2 — shaped by the Mosaic remote-compiler bisect
(benchmarks/mosaic_bisect{,2,3,4}_probe.py, 2026-08-17). This backend's
compiler HTTP-500s on (a) lane-axis ``jnp.concatenate`` in bf16 (f32 passes),
(b) ``make_async_copy`` whose block minor dim is tiny (rank-3 / lane-128
shapes pass), and rejects (c) strided slices (``v[0::2]`` lowers to a gather:
"Only 2D gather is supported"). Surviving constructs: storing tap slices into
a scratch ref ("scratch_im2col_store": ok) and K-split matmuls. So v2 uses
NONE of the fragile ops:

  * The overlapping halo tiles that a BlockSpec cannot express are built on
    the XLA side by ``_overlap_windows`` — two reshapes and ONE leading-axis
    concat per spatial axis (no gather, no dynamic slices), costing one extra
    ~1.7x copy of the 56 MB input (~0.2 ms of HBM traffic at full res).
  * The input is passed channel-planar AND pre-shifted in z (3 copies), so
    every in-kernel tap ``xs[dx:dx+fx, dy:dy+fy, :]`` slices only
    major/sublane axes; the z(lane) axis is never sliced at an offset.
  * im2col is built K-MAJOR by storing the 27*Cin taps into rows of a
    ``(27*Cin, fx, fy, Z)`` VMEM scratch — layout-identical stores, no
    concat — and the conv collapses to ONE MXU matmul
    ``(Cout, K) @ (K, fx*fy*Z)`` with K = 27*Cin.
  * LeakyReLU and the 2x2x2 max-pool run in registers via pair-split
    reshape+max (strided slices are rejected, see above); only the pooled
    ``(Cout, fx/2, fy/2, Z/2)`` tile is written. The channel-first result is
    rearranged to NHWC once, outside the kernel, by XLA.

Reference op being accelerated: the first encoder level of
``vxm.networks.VxmDense``'s U-Net (`train_synthmorph.py:276`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _overlap_windows(a, axis: int, blk: int, halo: int = 2):
    """Overlapping windows of size ``blk+halo``, stride ``blk``, along ``axis``.

    ``a.shape[axis]`` must equal ``n*blk + halo``. Returns windows stacked on a
    new axis at ``axis`` (shape ``..., n, blk+halo, ...``). Built from two
    reshapes + a size-``halo`` head slice + one concat on the (non-minor)
    window axis — no gathers, so it stays layout-friendly on TPU.
    """
    a = jnp.moveaxis(a, axis, 0)
    n = (a.shape[0] - halo) // blk
    assert n * blk + halo == a.shape[0], (a.shape, axis, blk, halo)
    body = a[: n * blk].reshape(n, blk, *a.shape[1:])
    # window i's tail rows are i*blk + blk + [0, halo): reshape a shifted view
    pad = ((0, blk - halo),) + ((0, 0),) * (a.ndim - 1)
    tail = jnp.pad(a[blk:], pad).reshape(n, blk, *a.shape[1:])[:, :halo]
    win = jnp.concatenate([body, tail], axis=1)  # (n, blk+halo, ...)
    return jnp.moveaxis(win, (0, 1), (axis, axis + 1))


def _kernel(*refs, FX, FY, Z, Cin, Cout, neg_slope, pool_z):
    x_refs, (wt_ref, b_ref, out_ref, s_ref) = refs[: 3 * Cin], refs[3 * Cin:]
    # im2col, K-major: row k = (c, dx, dy, dz) tap, layout-identical store
    k = 0
    for c in range(Cin):
        for dx in range(3):
            for dy in range(3):
                for dz in range(3):
                    xs = x_refs[c * 3 + dz]  # (1, FX+2, FY+2, Z)
                    s_ref[k] = xs[0, dx:dx + FX, dy:dy + FY, :]
                    k += 1
    K = 27 * Cin
    acc = jnp.dot(wt_ref[:], s_ref[:].reshape(K, FX * FY * Z),
                  preferred_element_type=jnp.float32)      # (Cout, vox)
    acc = acc + b_ref[:]
    acc = jnp.where(acc >= 0, acc, neg_slope * acc)
    full = acc.reshape(Cout, FX, FY, Z)

    # 2x max-pool via pair-split reshape + max (strided slices are rejected
    # by this backend's Mosaic: `v[0::2]` lowers to a gather).
    p = full.reshape(Cout, FX // 2, 2, FY, Z).max(axis=2)            # x
    p = p.reshape(Cout, FX // 2, FY // 2, 2, Z).max(axis=3)          # y
    if pool_z:  # lane-axis pair split; gated in case Mosaic rejects it
        p = p.reshape(Cout, FX // 2, FY // 2, Z // 2, 2).max(axis=4)
    out_ref[0] = p.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("neg_slope", "block", "out_dtype", "pool_z", "interpret"),
)
def conv3_lrelu_pool(x, w, b, neg_slope: float = 0.2, block=(4, 16),
                     out_dtype=jnp.bfloat16, pool_z: bool = True,
                     interpret: bool = False):
    """``maxpool2(leaky_relu(conv3x3x3(x, w) + b))`` without materializing the
    full-resolution activation.

    Args:
      x: ``(X, Y, Z, Cin)`` input (any float dtype; computed in bf16 on MXU).
      w: ``(3, 3, 3, Cin, Cout)`` HWIO conv kernel.
      b: ``(Cout,)`` bias.
      block: full-res tile extent ``(fx, fy)`` per grid step (each covers the
        full Z). VMEM per step ~= 4*fx*fy*Z*(27*Cin/2 + 2*Cout) bytes.
      pool_z: pool the z axis inside the kernel (lane-axis pair split). When
        False the kernel emits full-Z tiles and XLA pools z outside (fallback
        costing one extra ~2x HBM round-trip of the output).

    Returns ``(X/2, Y/2, Z/2, Cout)`` in ``out_dtype``.
    """
    X, Y, Z, Cin = x.shape
    Cout = w.shape[-1]
    FX, FY = block
    FX, FY = min(FX, X), min(FY, Y)
    assert X % FX == 0 and Y % FY == 0 and FX % 2 == FY % 2 == 0 and Z % 2 == 0
    NX, NY, NT = X // FX, Y // FY, (X // FX) * (Y // FY)

    # channel-planar, z-pre-shifted halo tiles: 3*Cin arrays, each
    # (NT, FX+2, FY+2, Z) — in-kernel taps then slice sublane axes only.
    xp = jnp.pad(x.astype(jnp.bfloat16),
                 ((1, 1), (1, 1), (1, 1), (0, 0)))      # (X+2, Y+2, Z+2, Cin)
    planes = []
    for c in range(Cin):
        for dz in range(3):
            pc = xp[:, :, dz:dz + Z, c]                 # (X+2, Y+2, Z)
            pc = _overlap_windows(pc, 0, FX)            # (NX, FX+2, Y+2, Z)
            pc = _overlap_windows(pc, 2, FY)            # (NX, FX+2, NY, FY+2, Z)
            planes.append(
                pc.transpose(0, 2, 1, 3, 4).reshape(NT, FX + 2, FY + 2, Z))

    # weights K-major, transposed: row k = (c, dx, dy, dz)
    wt = w.transpose(3, 0, 1, 2, 4).reshape(27 * Cin, Cout).T
    wt = wt.astype(jnp.bfloat16)                        # (Cout, 27*Cin)
    b2 = b.reshape(Cout, 1).astype(jnp.float32)

    PZ = Z // 2 if pool_z else Z
    kern = functools.partial(_kernel, FX=FX, FY=FY, Z=Z, Cin=Cin, Cout=Cout,
                             neg_slope=neg_slope, pool_z=pool_z)
    tile = pl.BlockSpec((1, FX + 2, FY + 2, Z), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(NT,),
        in_specs=[tile] * (3 * Cin) + [
            pl.BlockSpec(memory_space=pltpu.VMEM),      # wt
            pl.BlockSpec(memory_space=pltpu.VMEM),      # b
        ],
        out_specs=pl.BlockSpec(
            (1, Cout, FX // 2, FY // 2, PZ), lambda i: (i, 0, 0, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NT, Cout, FX // 2, FY // 2, PZ),
                                       out_dtype),
        scratch_shapes=[pltpu.VMEM((27 * Cin, FX, FY, Z), jnp.bfloat16)],
        interpret=interpret,
    )(*planes, wt, b2)

    # (NT, Cout, fx/2, fy/2, PZ) -> NHWC (X/2, Y/2, PZ, Cout), one XLA pass
    out = out.reshape(NX, NY, Cout, FX // 2, FY // 2, PZ)
    out = out.transpose(0, 3, 1, 4, 5, 2).reshape(X // 2, Y // 2, PZ, Cout)
    if not pool_z:
        out = jax.lax.reduce_window(out, -jnp.inf, jax.lax.max,
                                    (1, 1, 2, 1), (1, 1, 2, 1), "VALID")
    return out


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
