"""SynthReg — the dense diffeomorphic registration model (VxmDense parity).

Parity target: ``vxm.networks.VxmDense`` as constructed by the reference with
``inshape/int_steps/int_resolution/svf_resolution/nb_unet_features``
(`train_synthmorph.py:271-277`, `bids_registration.py:303-311`):

  * U-Net over ``concat(moving, fixed)`` produces features at ``1/svf_res``
    resolution (via ``nb_upsample_skips = log2(svf_res)``),
  * a 3-channel 3³ conv head (kernel init N(0, 1e-5²)) emits the SVF,
  * the SVF is rescaled to ``1/int_res`` resolution if needed, then integrated
    with scaling-and-squaring (``int_steps``),
  * the integrated field is rescaled to full resolution to warp the moving
    image.

Outputs mirror the reference's ``model.predict`` contract — ``(moved,
warp_at_int_res)`` — which is why the inference CLIs treat a half-resolution
warp with ``rescale=2`` (`bids_registration.py:327-338`). The full-resolution
field (``references.pos_flow`` in the reference, used for the training losses
at `train_synthmorph.py:297-307`) is exposed as ``flow_fullres``.

Weights are spatial-shape-agnostic (pure conv), so the same params apply at any
``inshape`` — the property the reference exploits via ``get_weights`` /
``set_weights`` at `bids_registration.py:311-312`.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from multimodal_registration_tpu.models.unet import Unet
from multimodal_registration_tpu.ops.integrate import integrate_svf
from multimodal_registration_tpu.ops.resize import rescale_field
from multimodal_registration_tpu.ops.warp import warp_batch


@dataclass(frozen=True)
class VxmConfig:
    """Network-architecture config — key names match `config/config.json:41-45`
    and `config/config_inference.json:5-9`."""

    enc: tuple = (64, 64, 64, 64)
    dec: tuple = (64, 64, 64, 64, 64, 64)
    int_steps: int = 5
    int_res: int = 2
    svf_res: int = 2
    compute_dtype: str = "bfloat16"
    # reduced precision for gathered values inside the scaling-and-squaring
    # loop ("" disables); detJ-neutral, ~27% faster warps (PERF.md)
    integrate_payload_dtype: str = "bfloat16"
    # inference-time SVF smoothing (voxels at the SVF grid, 0 = off): a
    # border-renormalized Gaussian applied before integration. TPU-native
    # extension for the cascade's step-1 model, whose raw SVF folds on
    # large-displacement subjects (benchmarks/cascade_smoothing_sweep.py).
    svf_smooth_sigma: float = 0.0
    # int8 quantized inference ("" = off): wide U-Net convs run int8 x int8 ->
    # int32 on the MXU with calibrated activation scales (models/quantize.py);
    # the flow head and thin convs stay full precision. Inference-only.
    quantize: str = ""

    @classmethod
    def from_json_dict(cls, d: dict) -> "VxmConfig":
        return cls(
            enc=tuple(d.get("enc", cls.enc)),
            dec=tuple(d.get("dec", cls.dec)),
            int_steps=int(d.get("int_steps", cls.int_steps)),
            int_res=int(d.get("int_res", cls.int_res)),
            svf_res=int(d.get("svf_res", cls.svf_res)),
            compute_dtype=str(d.get("compute_dtype", cls.compute_dtype)),
            integrate_payload_dtype=str(
                d.get("integrate_payload_dtype", cls.integrate_payload_dtype)
            ),
            svf_smooth_sigma=float(d.get("svf_smooth_sigma", cls.svf_smooth_sigma)),
            quantize=str(d.get("quantize", cls.quantize) or ""),
        )


class VxmDense(nn.Module):
    """Flax module. Inputs ``moving``/``fixed``: ``(B, X, Y, Z, 1)`` floats."""

    cfg: VxmConfig = VxmConfig()
    # when cfg.quantize is set: run full precision while recording activation
    # amaxes into the mutable "quant" collection (models/quantize.py)
    quant_calibrate: bool = False

    @nn.compact
    def __call__(self, moving: jnp.ndarray, fixed: jnp.ndarray):
        cfg = self.cfg
        inshape = moving.shape[1:4]
        for d in inshape:
            if d % 16:
                raise ValueError(
                    f"spatial dims must be multiples of 16 (got {inshape}); the "
                    "preprocessing pads to floor16 shapes (bids_registration.py:158)"
                )
        dtype = jnp.dtype(cfg.compute_dtype)
        x = jnp.concatenate([moving, fixed], axis=-1)

        nb_upsample_skips = int(math.floor(math.log2(cfg.svf_res))) if cfg.svf_res > 1 else 0
        feat = Unet(
            enc_nf=tuple(cfg.enc),
            dec_nf=tuple(cfg.dec),
            nb_upsample_skips=nb_upsample_skips,
            dtype=dtype,
            quant=cfg.quantize,
            calibrate=self.quant_calibrate,
            name="unet",
        )(x)

        svf = nn.Conv(
            3,
            kernel_size=(3, 3, 3),
            padding="SAME",
            kernel_init=nn.initializers.normal(stddev=1e-5),
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            name="flow",
        )(feat.astype(jnp.float32))

        # rescale SVF grid to the requested svf resolution (usually a no-op:
        # the U-Net already stops at 1/svf_res)
        svf_shape = tuple(int(round(d / cfg.svf_res)) for d in inshape)
        if tuple(svf.shape[1:4]) != svf_shape:
            f = svf_shape[0] / svf.shape[1]
            svf = jax.vmap(lambda v: rescale_field(v, f, out_shape=svf_shape))(svf)

        # optional inference-time SVF smoothing (at the SVF grid, before
        # integration — see VxmConfig.svf_smooth_sigma)
        if cfg.svf_smooth_sigma > 0:
            from multimodal_registration_tpu.ops.field import smooth_field_batch

            svf = smooth_field_batch(svf, cfg.svf_smooth_sigma)

        # rescale to integration resolution
        int_shape = tuple(int(round(d / cfg.int_res)) for d in inshape)
        flow = svf
        if tuple(flow.shape[1:4]) != int_shape:
            f = int_shape[0] / flow.shape[1]
            flow = jax.vmap(lambda v: rescale_field(v, f, out_shape=int_shape))(flow)

        # diffeomorphic integration (scaling and squaring); with
        # MMREG_ZLINE_MODEL=1 the squaring warps take the z-line row-reduction
        # path (flows are svf/2^k — small and smooth — with per-step guarded
        # fallback; see ops/warp_zline.py)
        use_zline = os.environ.get("MMREG_ZLINE_MODEL", "0") == "1"
        if cfg.int_steps > 0:
            pd = jnp.dtype(cfg.integrate_payload_dtype) if cfg.integrate_payload_dtype else None
            if use_zline:
                from multimodal_registration_tpu.ops.warp_zline import (
                    integrate_svf_zline_batch,
                )

                pos_flow = integrate_svf_zline_batch(
                    flow, cfg.int_steps, payload_dtype=pd
                )
            else:
                pos_flow = jax.vmap(
                    lambda v: integrate_svf(v, cfg.int_steps, payload_dtype=pd)
                )(flow)
        else:
            pos_flow = flow

        # full-resolution field for warping
        if tuple(pos_flow.shape[1:4]) != tuple(inshape):
            factors = tuple(i / c for i, c in zip(inshape, pos_flow.shape[1:4]))
            flow_fullres = jax.vmap(
                lambda v: rescale_field(v, factors, out_shape=inshape)
            )(pos_flow)
        else:
            flow_fullres = pos_flow

        # warp_batch (not vmap(warp)): keeps the chunked path's halo cond a
        # real conditional — vmap would turn it into a both-branches select.
        # When the field is exactly the half grid, the fused path upsamples
        # it per-chunk inside the warp instead of materializing flow_fullres
        # (MMREG_FUSED_UPWARP=0 restores the explicit rescale; VERDICT r4
        # directive 2 — flow_fullres above is then DCE'd by XLA whenever no
        # output consumer asks for it)
        fused_up = (
            os.environ.get("MMREG_FUSED_UPWARP", "1") == "1"
            and not use_zline
            and tuple(2 * d for d in pos_flow.shape[1:4]) == tuple(inshape)
        )
        if use_zline:
            from multimodal_registration_tpu.ops.warp_zline import warp_zline_batch

            moved = warp_zline_batch(moving.astype(jnp.float32), flow_fullres)
        elif fused_up:
            from multimodal_registration_tpu.ops.warp import warp_up2x_batch

            moved = warp_up2x_batch(moving.astype(jnp.float32), pos_flow)
        else:
            moved = warp_batch(moving.astype(jnp.float32), flow_fullres, interp="linear")
        return {
            "moved": moved,
            "warp": pos_flow,  # at int-res: the reference predict() output #2
            "flow_fullres": flow_fullres,
            "svf": svf,
        }


def build_model(cfg: VxmConfig) -> VxmDense:
    return VxmDense(cfg=cfg)


def init_params(cfg: VxmConfig, inshape=(32, 32, 32), seed: int = 0):
    """Initialize shape-agnostic params at any (small) inshape."""
    model = VxmDense(cfg=cfg)
    key = jax.random.PRNGKey(seed)
    dummy = jnp.zeros((1, *inshape, 1), jnp.float32)
    return model.init(key, dummy, dummy)


def params_template(cfg: VxmConfig, inshape=(16, 16, 16)):
    """Zero-filled params pytree with the right structure/shapes, built WITHOUT
    any device compute (via ``jax.eval_shape``) — cheap on slow-compile
    backends when the values are about to be overwritten by a checkpoint."""
    import numpy as np

    model = VxmDense(cfg=cfg)
    dummy = jax.ShapeDtypeStruct((1, *inshape, 1), jnp.float32)
    shapes = jax.eval_shape(
        lambda k, m, f: model.init(k, m, f),
        jax.ShapeDtypeStruct((2,), jnp.uint32),
        dummy,
        dummy,
    )
    return jax.tree_util.tree_map(lambda s: np.zeros(s.shape, s.dtype), shapes)


def apply_model(cfg: VxmConfig, params, moving, fixed):
    return VxmDense(cfg=cfg).apply(params, moving, fixed)
