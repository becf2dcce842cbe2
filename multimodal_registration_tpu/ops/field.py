"""Dense displacement-field algebra: composition.

Parity target: ``vxm.utils.compose`` used by the two-step cascade
(`bids_two_steps_registration.py:324,346,369,484`).
"""

from __future__ import annotations

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


def compose_many(fields) -> jnp.ndarray:
    """Left fold of :func:`compose_fields` over an ordered list of fields
    (first applied first)."""
    out = fields[0]
    for f in fields[1:]:
        out = compose_fields(out, f)
    return out
