"""int8 quantized-inference calibration for the registration model.

The reference's published *inference* architecture (enc [256]x4 / dec [256]x6,
`config/config_inference.json:8-9`) is conv-dominated on TPU (83% of the
forward, PERF.md round 4b). v5e-class MXUs advertise 2x int8 peak over bf16,
and the measured int8 Conv3D rate at the hot 96³x256 shape clears the 1.5x
adoption gate (`benchmarks/int8_conv_probe.py`). This module produces the
activation scales that make the int8 path usable:

  * Weights quantize ON THE FLY from the f32 params inside the jit (symmetric,
    per-output-channel) — checkpoint format is unchanged.
  * Activations need a per-tensor scale known BEFORE the conv (so XLA can fuse
    dequant -> LeakyReLU -> requantize into the producing conv's epilogue —
    dynamic per-call amax would force an extra full pass over a ~450 MB
    activation). Scales are calibrated here by running the full-precision
    model over sample pairs while each quantizable ConvBlock records the
    running amax of its input into the mutable ``"quant"`` collection
    (`models/unet.py::ConvBlock`).

Calibrated scales are tiny (one scalar per wide conv) and serialize to a JSON
sidecar next to the checkpoint (``save_scales``/``load_scales``).

Quantization is a TPU-native extension (the reference is f32 TF-CPU,
`bids_registration.py:303-311` loads f32 Keras weights); it is opt-in via the
``quantize`` config key and inference-only.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_registration_tpu.models.vxm_dense import VxmConfig, VxmDense


def _as_quantized_cfg(cfg: VxmConfig) -> VxmConfig:
    if cfg.quantize == "int8":
        return cfg
    import dataclasses

    return dataclasses.replace(cfg, quantize="int8")


def calibrate_scales(cfg: VxmConfig, params, pairs, margin: float = 1.25):
    """Run the full-precision model over ``pairs`` and return the ``"quant"``
    collection of per-layer activation amaxes.

    ``pairs`` is an iterable of ``(moving, fixed)`` arrays shaped
    ``(B, X, Y, Z, 1)`` (or ``(X, Y, Z)`` — they are reshaped). ``margin``
    scales the recorded amax up to absorb activation spread on unseen inputs
    (values beyond the scale clip at +-127).
    """
    model = VxmDense(cfg=_as_quantized_cfg(cfg), quant_calibrate=True)
    variables = dict(params)
    quant = None

    @jax.jit
    def _calib(vars_in, mov, fx):
        _, mut = model.apply(vars_in, mov, fx, mutable=["quant"])
        # nets with no quantizable conv record nothing at all
        return mut["quant"] if "quant" in mut else {}

    for mov, fx in pairs:
        mov = jnp.asarray(mov, jnp.float32)
        fx = jnp.asarray(fx, jnp.float32)
        if mov.ndim == 3:
            mov, fx = mov[None, ..., None], fx[None, ..., None]
        vars_in = {**variables, "quant": quant} if quant is not None else variables
        quant = _calib(vars_in, mov, fx)
    if quant is None:
        raise ValueError("calibrate_scales needs at least one (moving, fixed) pair")
    quant = jax.tree_util.tree_map(lambda a: np.float32(a) * np.float32(margin),
                                   jax.device_get(quant))
    # plain nested dict (FrozenDict-free) so it merges into any variables dict
    return jax.tree_util.tree_map(lambda x: x, _to_plain(quant))


def _to_plain(tree):
    if hasattr(tree, "items"):
        return {k: _to_plain(v) for k, v in tree.items()}
    return tree


def save_scales(path: str, quant) -> None:
    """Write the ``"quant"`` collection as a flat JSON sidecar."""
    from flax.traverse_util import flatten_dict

    flat = {"/".join(k): float(v) for k, v in flatten_dict(_to_plain(quant)).items()}
    with open(path, "w") as f:
        json.dump(flat, f, indent=1, sort_keys=True)


def sidecar_path(model_path: str) -> str:
    return model_path + ".quant.json"


def maybe_load_sidecar(model_path: str, cfg) -> "dict | None":
    """Scales for a checkpoint, if ``<model_path>.quant.json`` exists and the
    config asks for quantization; None otherwise (the registrars then
    lazily calibrate on the first predicted pair)."""
    import os

    p = sidecar_path(model_path)
    if str(getattr(cfg, "quantize", "") or "") and os.path.exists(p):
        return load_scales(p)
    return None


def sidecar_kwargs(model_path: str, cfg) -> dict:
    """Registrar-construction kwargs for the int8 sidecar contract: pre-load
    scales when ``<model>.quant.json`` exists, and point lazy calibration at
    that path otherwise (so the one-time calibration forward persists its
    result and is paid once per checkpoint, not once per process)."""
    if not str(getattr(cfg, "quantize", "") or ""):
        return {}
    return {
        "quant_scales": maybe_load_sidecar(model_path, cfg),
        "quant_sidecar": sidecar_path(model_path),
    }


def load_scales(path: str):
    """Read a sidecar written by :func:`save_scales` back into a collection."""
    from flax.traverse_util import unflatten_dict

    with open(path) as f:
        flat = json.load(f)
    return unflatten_dict(
        {tuple(k.split("/")): jnp.float32(v) for k, v in flat.items()}
    )
