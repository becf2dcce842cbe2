"""3-D convolution lowerings.

``conv3d_direct`` is XLA's native Conv3D — the default lowering used by the
U-Net (`models/unet.py::ConvBlock`, parity target `vxm.networks.Unet` conv
blocks, reference `train_synthmorph.py:271-277`).

``conv3d_tap2d`` lowers the same 3x3x3 convolution as THREE 3x3 Conv2Ds (one
per tap along a chosen spatial axis, that axis folded into the conv batch
dim, partial sums accumulated in f32):

    out[x, y, z, co] = sum_dx conv2d_yz(in[x + dx - 1], W[dx])

This exists because XLA's Conv3D lowering reaches only 10-16% of bf16 MXU
peak at 64-channel widths on the probed TPU backend, while its Conv2D path is
the production-CNN path (PERF.md speed-of-light table; probe:
`benchmarks/conv2d_decomp_probe.py`). The decomposition is exact up to f32
partial-sum ordering — same FLOPs, same zero-padding semantics (explicit pad
+ strided tap slices).

Both are plain differentiable XLA ops: the tap2d backward is three Conv2D
adjoints, so the lowering applies in training too.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def conv3d_direct(x, k, stride: int = 1, out_dtype=jnp.float32):
    """One XLA Conv3D. x: (B, X, Y, Z, Cin); k: (3, 3, 3, Cin, Cout)."""
    dn = lax.conv_dimension_numbers(x.shape, k.shape, ("NXYZC", "XYZIO", "NXYZC"))
    return lax.conv_general_dilated(
        x, k, (stride,) * 3, "SAME", dimension_numbers=dn,
        preferred_element_type=out_dtype,
    )


def conv3d_tap2d(x, k, stride: int = 1, out_dtype=jnp.float32, tap_axis: int = 1):
    """3x3x3 conv as three 3x3 Conv2Ds; taps along ``tap_axis`` (1=X or 3=Z).

    SAME zero-padding in all three dims; the tap axis pads explicitly and each
    tap slices the planes feeding its output positions (stride-aware). Partial
    sums accumulate in ``out_dtype`` (f32 by default).
    """
    if k.shape[:3] != (3, 3, 3):
        raise ValueError(f"conv3d_tap2d expects a 3x3x3 kernel, got {k.shape}")
    b, X, Y, Z, ci = x.shape

    def _same_pad(n):
        # XLA SAME: pad_total = (nout-1)*stride + k - n, low gets the floor —
        # asymmetric (0, 1) for even n at stride 2
        nout = -(-n // stride)
        total = max((nout - 1) * stride + 3 - n, 0)
        return nout, total // 2, total - total // 2

    if tap_axis == 1:
        nout, lo, hi = _same_pad(X)
        xp = jnp.pad(x, ((0, 0), (lo, hi), (0, 0), (0, 0), (0, 0)))
        out = None
        for dx in range(3):
            # input planes feeding output x_o: x_in = stride*x_o + dx (padded)
            sl = lax.slice_in_dim(xp, dx, dx + stride * (nout - 1) + 1, stride, axis=1)
            sl = sl.reshape(b * nout, Y, Z, ci)
            dn = lax.conv_dimension_numbers(sl.shape, k[dx].shape, ("NHWC", "HWIO", "NHWC"))
            part = lax.conv_general_dilated(
                sl, k[dx], (stride, stride), "SAME", dimension_numbers=dn,
                preferred_element_type=out_dtype,
            )
            out = part if out is None else out + part
        return out.reshape(b, nout, -(-Y // stride), -(-Z // stride), out.shape[-1])
    if tap_axis == 3:
        nout, lo, hi = _same_pad(Z)
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (lo, hi), (0, 0)))
        out = None
        for dz in range(3):
            sl = lax.slice_in_dim(xp, dz, dz + stride * (nout - 1) + 1, stride, axis=3)
            sl = jnp.moveaxis(sl, 3, 1).reshape(b * nout, X, Y, ci)
            kk = k[:, :, dz]
            dn = lax.conv_dimension_numbers(sl.shape, kk.shape, ("NHWC", "HWIO", "NHWC"))
            part = lax.conv_general_dilated(
                sl, kk, (stride, stride), "SAME", dimension_numbers=dn,
                preferred_element_type=out_dtype,
            )
            out = part if out is None else out + part
        out = out.reshape(b, nout, -(-X // stride), -(-Y // stride), out.shape[-1])
        return jnp.moveaxis(out, 1, 3)
    raise ValueError(f"tap_axis must be 1 (X) or 3 (Z), got {tap_axis}")


def conv3d_tap2d_slab(
    x,
    k,
    *,
    out_dtype,
    acc_dtype=jnp.float32,
    max_acc_bytes: int = 2 << 30,
):
    """Stride-1 z-tap decomposition with z-slab chunking under an
    accumulator-bytes budget.

    The plain ``conv3d_tap2d`` keeps up to three full-volume partial sums in
    ``acc_dtype`` alive at once — at the published widths' first conv
    (2→256 at 192³) that is 3×6.75 GB f32 and exceeds HBM. Here the output is
    computed in z slabs sized so one slab's accumulator stays under
    ``max_acc_bytes``; each slab casts to ``out_dtype`` (the conv's normal
    output dtype — bf16 in the model) before concatenation, so peak memory is
    output + one slab's partials. With ``acc_dtype == out_dtype == int32``
    (the int8 path) the result is bit-identical to the direct int8 Conv3D
    (integer adds commute).
    """
    if k.shape[:3] != (3, 3, 3):
        raise ValueError(f"conv3d_tap2d_slab expects a 3x3x3 kernel, got {k.shape}")
    b, X, Y, Z, ci = x.shape
    co = k.shape[-1]
    acc_bytes = b * X * Y * Z * co * jnp.dtype(acc_dtype).itemsize
    n_slabs = max(1, -(-acc_bytes // max_acc_bytes))
    if n_slabs == 1:
        return conv3d_tap2d(x, k, out_dtype=acc_dtype, tap_axis=3).astype(out_dtype)
    step = -(-Z // n_slabs)
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 1), (0, 0)))
    outs = []
    for z0 in range(0, Z, step):
        nz = min(step, Z - z0)
        xs = lax.slice_in_dim(xp, z0, z0 + nz + 2, 1, axis=3)
        acc = None
        for dz in range(3):
            sl = lax.slice_in_dim(xs, dz, dz + nz, 1, axis=3)
            sl = jnp.moveaxis(sl, 3, 1).reshape(b * nz, X, Y, ci)
            kk = k[:, :, dz]
            dn = lax.conv_dimension_numbers(sl.shape, kk.shape, ("NHWC", "HWIO", "NHWC"))
            part = lax.conv_general_dilated(
                sl, kk, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=acc_dtype,
            )
            acc = part if acc is None else acc + part
        acc = jnp.moveaxis(acc.reshape(b, nz, X, Y, co), 1, 3)
        outs.append(acc.astype(out_dtype))
    return jnp.concatenate(outs, axis=3)
