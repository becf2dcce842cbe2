"""3-D U-Net backbone in Flax, mirroring the VoxelMorph U-Net topology.

Parity target: the ``Unet`` inside ``vxm.networks.VxmDense`` as configured by
``nb_unet_features=(enc, dec)`` (`train_synthmorph.py:276`,
`config/config.json:44-45`):

  * encoder: one 3³ conv + LeakyReLU(0.2) per level, 2× max-pool between
    levels (``len(enc)`` levels);
  * decoder: one 3³ conv + LeakyReLU per level; after each of the first
    ``len(enc) - nb_upsample_skips`` decoder levels, 2× nearest upsampling and
    skip concatenation (``[upsampled, skip]`` order, matching Keras);
  * remaining ``dec[len(enc):]`` entries are extra convs at the final
    resolution.

With ``nb_upsample_skips = log2(svf_res)`` the output feature map sits at
``1/svf_res`` resolution — this is how ``svf_res=2`` halves the SVF grid
(`config/README.md:54`).

TPU notes: channels-last NDHWC layout (native for XLA TPU convs), bfloat16
compute with float32 parameters by default. 3³ convs map onto the MXU as
implicit GEMMs; XLA fuses the LeakyReLU.
"""

from __future__ import annotations

import os
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from multimodal_registration_tpu.ops.pool import max_pool_2x


def _conv2d_decomp_enabled() -> bool:
    """Lower 3x3x3 convs as three z-tap Conv2Ds (`ops/conv3.py::conv3d_tap2d`).

    XLA's Conv3D reaches only 10-16% of bf16 MXU peak at 64-channel widths on
    the probed TPU backend while its Conv2D path tiles far better — measured
    1.5-2.1x per-conv at the hot shapes (benchmarks/conv2d_decomp_probe.py,
    PERF.md round 5). The model path accumulates taps in the COMPUTE dtype
    (bf16: within ~1 ulp of the direct conv's single rounding; int8: int32,
    bit-exact), z-slabbed under an HBM budget (_conv2d_acc_budget).
    MMREG_CONV2D_DECOMP: "1" forces on, "0" forces off, unset = auto (on for
    TPU backends, off on CPU where XLA's direct Conv3D is the better
    lowering)."""
    import jax

    v = os.environ.get("MMREG_CONV2D_DECOMP", "")
    if v in ("0", "1"):
        return v == "1"
    return jax.default_backend() not in ("cpu",)


def _conv2d_acc_budget() -> int:
    """Per-slab accumulator budget for the decomposed conv, in bytes.

    MMREG_CONV2D_ACC_MB (default 4096): single-slab at the flagship widths
    AND at the published widths' full-res first conv (2→256 at 192³ = 3.4 GB
    bf16 — a 2-slab split there cost ~12 ms, PERF.md round 5g; measured
    no-OOM and slightly faster for w256 TRAINING too, 0.590 vs 0.602
    s/step). The budget exists because truly unbounded accumulators OOM
    (an f32 full-volume partial at those widths is 6.75 GB x3)."""
    return int(os.environ.get("MMREG_CONV2D_ACC_MB", "4096")) << 20


def _fuse_first_conv_enabled() -> bool:
    """Fused first-conv+pool Pallas kernel opt-in (MMREG_FUSED_FIRST_CONV=1).

    Only meaningful on TPU backends; kept opt-in until hardware-validated per
    backend (Mosaic lowerings vary — PERF.md probe history). INFERENCE-ONLY:
    the kernel has no custom VJP yet — do not enable during training."""
    return os.environ.get("MMREG_FUSED_FIRST_CONV", "0") == "1"


class ConvBlock(nn.Module):
    features: int
    dtype: Any = jnp.bfloat16
    # fuse conv+LeakyReLU+2x-maxpool into one Pallas kernel and return the
    # POOLED tensor — valid only when the full-res activation has no other
    # consumer (see Unet below). Param tree is unchanged ("conv/kernel").
    fused_pool: bool = False
    # int8 quantized-inference mode ("" = off): int8 x int8 -> int32 conv on
    # the MXU (2x bf16 peak on v5e-class chips) with per-output-channel weight
    # scales and a calibrated per-tensor activation scale, dequant + bias +
    # LeakyReLU fused at the output. Only convs with >= quant_min_cin input
    # channels quantize (thin convs are bandwidth-bound — no MXU win, PERF.md
    # int8 probe). Weights quantize on the fly from the f32 params (checkpoint
    # format unchanged); activation scales live in the "quant" collection.
    quant: str = ""
    quant_min_cin: int = 64
    # calibration pass: run the normal conv path while recording the running
    # amax of each quantizable conv's input into the mutable "quant" collection
    calibrate: bool = False

    @nn.compact
    def __call__(self, x):
        conv = nn.Conv(
            self.features,
            kernel_size=(3, 3, 3),
            padding="SAME",
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )
        quantizable = (
            self.quant == "int8"
            and not self.fused_pool
            and x.ndim == 5
            and x.shape[-1] >= self.quant_min_cin
            and not self.is_initializing()  # init materializes params normally
        )
        if quantizable and self.calibrate:
            amax = self.variable(
                "quant", "amax", lambda: jnp.zeros((), jnp.float32)
            )
            amax.value = jnp.maximum(
                amax.value, jnp.max(jnp.abs(x.astype(jnp.float32)))
            )
        elif quantizable:
            if not self.has_variable("quant", "amax"):
                raise ValueError(
                    "quantize='int8' needs calibrated activation scales: apply "
                    "with a 'quant' collection (models/quantize.py::calibrate_scales)"
                )
            return self._int8_conv(conv, x)
        if (
            not self.fused_pool
            and x.ndim == 5
            and not self.is_initializing()
            and _conv2d_decomp_enabled()
        ):
            # three-Conv2D lowering of the same conv (see _conv2d_decomp_enabled);
            # params materialize identically via a 1-voxel probe call (DCE'd).
            # z-slabbed under an f32-accumulator budget: full-volume f32
            # partials OOM HBM at the published widths' first conv (2->256 at
            # 192^3 = 3x6.75 GB) — see conv3d_tap2d_slab.
            from multimodal_registration_tpu.ops.conv3 import conv3d_tap2d_slab

            _ = conv(x[:, :1, :1, :1, :])
            k = conv.variables["params"]["kernel"]
            b = conv.variables["params"]["bias"]
            # acc_dtype == compute dtype: a f32 preferred_element_type with
            # bf16 operands breaks the conv TRANSPOSE (the f32 cotangent meets
            # the bf16 kernel -> dtype-mismatch error), and the MXU
            # accumulates each tap in f32 internally anyway — only the 3-tap
            # cross-sum rounds in bf16 (~1 ulp vs the direct conv's single
            # rounding)
            y = conv3d_tap2d_slab(
                x.astype(self.dtype), k.astype(self.dtype),
                out_dtype=self.dtype, acc_dtype=self.dtype,
                max_acc_bytes=_conv2d_acc_budget(),
            )
            y = y + b.astype(y.dtype)
            return nn.leaky_relu(y, negative_slope=0.2).astype(self.dtype)
        if self.fused_pool:
            from multimodal_registration_tpu.ops.pallas.conv_pool import (
                conv3_lrelu_pool,
            )

            # materialize identical params without running the full conv
            _ = conv(x[:, :1, :1, :1, :])
            k = conv.variables["params"]["kernel"]
            b = conv.variables["params"]["bias"]
            pooled = [
                conv3_lrelu_pool(x[i], k, b, out_dtype=self.dtype)
                for i in range(x.shape[0])
            ]
            return jnp.stack(pooled)
        x = conv(x)
        return nn.leaky_relu(x, negative_slope=0.2)

    def _int8_conv(self, conv, x):
        """int8 x int8 -> int32 conv + fused f32 dequant/bias/LeakyReLU.

        Symmetric quantization (zero-point 0, so SAME zero-padding stays
        exact): per-output-channel weight scales from the f32 kernel, a
        calibrated per-tensor activation scale from the "quant" collection.
        Output returns in ``self.dtype`` like the bf16 path, so XLA fuses the
        next layer's re-quantize into this conv's epilogue."""
        from jax import lax

        # materialize identical params without running the full conv
        _ = conv(x[:, :1, :1, :1, :])
        k = conv.variables["params"]["kernel"].astype(jnp.float32)
        b = conv.variables["params"]["bias"].astype(jnp.float32)
        w_scale = jnp.maximum(
            jnp.max(jnp.abs(k), axis=(0, 1, 2, 3)), 1e-12
        ) / 127.0  # (cout,)
        kq = jnp.clip(jnp.round(k / w_scale), -127, 127).astype(jnp.int8)
        a_scale = jnp.maximum(
            self.get_variable("quant", "amax").astype(jnp.float32), 1e-12
        ) / 127.0
        xq = jnp.clip(
            jnp.round(x.astype(jnp.float32) * (1.0 / a_scale)), -127, 127
        ).astype(jnp.int8)
        if _conv2d_decomp_enabled():
            # same three-Conv2D lowering as the bf16 path, int32 partials —
            # exact (integer adds commute, and the slab cast is int32→int32);
            # measured faster than int8 Conv3D on hardware
            # (benchmarks/conv2d_decomp_int8_probe.py)
            from multimodal_registration_tpu.ops.conv3 import conv3d_tap2d_slab

            y = conv3d_tap2d_slab(
                xq, kq, out_dtype=jnp.int32, acc_dtype=jnp.int32,
                max_acc_bytes=_conv2d_acc_budget(),
            )
        else:
            dn = lax.conv_dimension_numbers(
                xq.shape, kq.shape, ("NXYZC", "XYZIO", "NXYZC")
            )
            y = lax.conv_general_dilated(
                xq, kq, (1, 1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.int32,
            )
        y = y.astype(jnp.float32) * (a_scale * w_scale) + b
        return nn.leaky_relu(y, negative_slope=0.2).astype(self.dtype)


def _upsample_nearest_2x(x):
    # (B, X, Y, Z, C) -> (B, 2X, 2Y, 2Z, C); Keras UpSampling3D parity
    for axis in (1, 2, 3):
        x = jnp.repeat(x, 2, axis=axis)
    return x


class Unet(nn.Module):
    enc_nf: Sequence[int]
    dec_nf: Sequence[int]
    nb_upsample_skips: int = 0
    dtype: Any = jnp.bfloat16
    quant: str = ""  # "" | "int8" — see ConvBlock.quant
    calibrate: bool = False

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        nb_levels = len(self.enc_nf) + 1
        # enc_0's FULL-RES activation feeds only the max-pool when
        # nb_upsample_skips >= 1 (the decoder stops before popping its skip)
        # — the fused Pallas kernel then writes only the pooled tensor,
        # skipping the 906 MB full-res round-trip (PERF.md conv attribution).
        import jax

        fuse0 = (
            _fuse_first_conv_enabled()
            and self.nb_upsample_skips >= 1
            and all(d % 16 == 0 for d in x.shape[1:4])
            and jax.default_backend() != "cpu"  # Mosaic needs a TPU backend
        )
        skips = [x]
        for i, f in enumerate(self.enc_nf):
            if i == 0 and fuse0:
                x = ConvBlock(f, dtype=self.dtype, fused_pool=True,
                              name=f"enc_{i}")(x)
                skips.append(None)  # never popped; keeps pop order aligned
                continue
            x = ConvBlock(f, dtype=self.dtype, quant=self.quant,
                          calibrate=self.calibrate, name=f"enc_{i}")(x)
            skips.append(x)
            # custom-VJP pool: reduce_window forward (same HLO as
            # nn.max_pool) + elementwise adjoint instead of XLA's
            # SelectAndScatter (ops/pool.py; benchmarks/unet_bwd_probe.py)
            x = max_pool_2x(x)

        # decoder: skips are popped deepest-first (enc_{N-1} … enc_0); the raw
        # input stays unused, matching the vxm Unet's encoder history
        for i, f in enumerate(self.dec_nf[: nb_levels - 1]):
            x = ConvBlock(f, dtype=self.dtype, quant=self.quant,
                          calibrate=self.calibrate, name=f"dec_{i}")(x)
            if i < (nb_levels - 1 - self.nb_upsample_skips):
                x = _upsample_nearest_2x(x)
                x = jnp.concatenate([x, skips.pop()], axis=-1)

        for j, f in enumerate(self.dec_nf[nb_levels - 1 :]):
            x = ConvBlock(f, dtype=self.dtype, quant=self.quant,
                          calibrate=self.calibrate, name=f"final_{j}")(x)
        return x
