"""Stationary-velocity-field integration via scaling and squaring.

Parity target: ``vxm.layers.VecInt(method='ss', int_steps=k)`` — the
diffeomorphic integration layer inside ``VxmDense`` (configured by
``int_steps``/``int_res``, `config/config.json:41-42`,
`config/README.md:52-53`).

Algorithm: ``phi_0 = v / 2**k``; repeat k times: ``phi = phi + warp(phi, phi)``.
Expressed with ``lax.fori_loop`` so XLA compiles a single rolled loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from multimodal_registration_tpu.ops.warp import warp


def integrate_svf(vel: jnp.ndarray, int_steps: int = 5) -> jnp.ndarray:
    """Integrate an SVF ``(X, Y, Z, 3)`` into a displacement field.

    ``int_steps=0`` returns ``vel`` unchanged (matching VecInt being skipped
    when ``int_steps == 0`` in ``VxmDense``).
    """
    if int_steps <= 0:
        return vel
    phi = vel.astype(jnp.float32) / (2.0**int_steps)

    def body(_, p):
        return p + warp(p, p, interp="linear")

    return jax.lax.fori_loop(0, int_steps, body, phi)
