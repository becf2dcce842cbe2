"""Dense displacement-field algebra: composition and smoothing.

Parity target: ``vxm.utils.compose`` used by the two-step cascade
(`bids_two_steps_registration.py:324,346,369,484`). ``smooth_field`` is a
TPU-native extension (inference-time SVF smoothing for the cascade's step-1
model; off by default — see ``InferenceConfig.svf_smooth_sigma``).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from multimodal_registration_tpu.ops.warp import warp, warp_batch


def compose_fields(phi1: jnp.ndarray, phi2: jnp.ndarray) -> jnp.ndarray:
    """Compose displacement fields so that warping by the result equals
    warping by ``phi1`` then ``phi2``.

    With the convention ``moved(x) = img(x + phi(x))``:
      step 1: ``moved1 = img ∘ (id + phi1)``
      step 2: ``moved2 = moved1 ∘ (id + phi2)``
    so the single equivalent field is ``phi(x) = phi2(x) + phi1(x + phi2(x))``.

    Mirrors ``vxm.utils.compose([phi1, phi2])``
    (`bids_two_steps_registration.py:324`).
    """
    return phi2 + warp(phi1, phi2, interp="linear")


def compose_fields_batch(phi1: jnp.ndarray, phi2: jnp.ndarray) -> jnp.ndarray:
    """Batched :func:`compose_fields` (``(B,X,Y,Z,3)`` fields).

    Goes through :func:`warp_batch` rather than ``vmap(compose_fields)`` so
    the chunked warp's halo guard stays a real ``lax.cond`` (vmap would
    execute both branches — see ``warp_batch``)."""
    return phi2 + warp_batch(phi1, phi2, interp="linear")


def smooth_field(field: jnp.ndarray, sigma: float, radius: int | None = None) -> jnp.ndarray:
    """Border-renormalized separable Gaussian smoothing of an ``(X, Y, Z, C)``
    field (``sigma`` in voxels of the field's own grid; static).

    Renormalization divides by the blur of a ones-volume so voxels near the
    border average only in-bounds neighbors (a plain zero-padded blur would
    pull the field toward zero there); a constant field is an exact fixed
    point. Any C1 SVF integrates to a diffeomorphism — smoothing the SVF
    before scaling-and-squaring attacks exported-field folding at its source
    (benchmarks/cascade_smoothing_sweep.py)."""
    from multimodal_registration_tpu.synth.image_engine import _gaussian_blur

    if sigma <= 0:
        return field
    r = int(math.ceil(3.0 * float(sigma))) if radius is None else int(radius)
    sig = jnp.float32(sigma)
    norm = _gaussian_blur(jnp.ones(field.shape[:3], jnp.float32), sig, r)
    blur_c = jax.vmap(lambda v: _gaussian_blur(v, sig, r) / norm,
                      in_axes=-1, out_axes=-1)
    return blur_c(field.astype(jnp.float32)).astype(field.dtype)


def smooth_field_batch(field: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Batched :func:`smooth_field` over ``(B, X, Y, Z, C)`` (pure pad +
    static-slice multiply-adds — vmap-safe, no cond)."""
    if sigma <= 0:
        return field
    return jax.vmap(lambda f: smooth_field(f, sigma))(field)


def compose_many(fields) -> jnp.ndarray:
    """Left fold of :func:`compose_fields` over an ordered list of fields
    (first applied first)."""
    out = fields[0]
    for f in fields[1:]:
        out = compose_fields(out, f)
    return out
