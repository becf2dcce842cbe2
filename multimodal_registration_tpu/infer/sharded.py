"""Spatially-sharded registration forward — the multi-chip path for volumes
larger than one chip's HBM.

This is the TPU-native upgrade of the reference's subvolume tiling
(`bids_registration.py:169-219`, SURVEY §5 "long-context analogue"): instead
of host-looped overlapping tiles + pyramid blending, the whole volume is
sharded over the ``space`` mesh axis (volume X dimension) and XLA inserts the
conv halo exchanges over ICI. One forward, no blending seams, bit-identical to
the single-chip result.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodal_registration_tpu.infer.config import InferenceConfig
from multimodal_registration_tpu.models.vxm_dense import VxmConfig, VxmDense


class ShardedRegistrar:
    """Registration forward over a ``(data, space)`` mesh."""

    def __init__(self, cfg: InferenceConfig, params, mesh: Mesh):
        self.cfg = cfg
        self.mesh = mesh
        vxm_cfg = VxmConfig(
            enc=tuple(cfg.enc),
            dec=tuple(cfg.dec),
            int_steps=cfg.int_steps,
            int_res=cfg.int_res,
            svf_res=cfg.svf_res,
            compute_dtype=cfg.compute_dtype,
        )
        self.model = VxmDense(cfg=vxm_cfg)
        self._vol_sharding = NamedSharding(mesh, P("data", "space"))
        self._repl = NamedSharding(mesh, P())
        self.params = jax.device_put(params, self._repl)

        self._apply = jax.jit(
            lambda p, m, f: self.model.apply(p, m, f),
            in_shardings=(self._repl, self._vol_sharding, self._vol_sharding),
            out_shardings={
                "moved": self._vol_sharding,
                "warp": self._vol_sharding,
                "flow_fullres": self._vol_sharding,
                "svf": self._vol_sharding,
            },
        )

    def predict(self, mov: np.ndarray, fx: np.ndarray):
        """(B, X, Y, Z) arrays; X must be divisible by the ``space`` axis size
        times 16 (model stride)."""
        space = self.mesh.shape["space"]
        if mov.shape[1] % (space * 16):
            raise ValueError(
                f"volume X dim {mov.shape[1]} not divisible by space axis "
                f"({space}) x 16"
            )
        mov_j = jax.device_put(
            jnp.asarray(mov, jnp.float32)[..., None], self._vol_sharding
        )
        fx_j = jax.device_put(
            jnp.asarray(fx, jnp.float32)[..., None], self._vol_sharding
        )
        out = self._apply(self.params, mov_j, fx_j)
        return np.asarray(out["moved"][..., 0]), np.asarray(out["warp"])
