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

import warnings

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodal_registration_tpu.infer.config import InferenceConfig
from multimodal_registration_tpu.models.vxm_dense import VxmConfig, VxmDense


class ShardedRegistrar:
    """Registration forward over a ``(data, space)`` mesh.

    Accepts any batch size (padded up to a multiple of the ``data`` axis
    internally — pad entries are zeros and are cropped from the outputs).
    Volumes whose X dim is not divisible by ``space * 16`` fall back to the
    single-device :class:`~multimodal_registration_tpu.infer.register.Registrar`
    path with a warning (spatial sharding needs whole conv strides per shard).
    """

    def __init__(self, cfg: InferenceConfig, params, mesh: Mesh,
                 max_batch: int = 4, svf_smooth_sigma: float | None = None,
                 quant_scales=None, quant_sidecar: str | None = None):
        from multimodal_registration_tpu.infer.register import vxm_config_from

        self.cfg = cfg
        self.mesh = mesh
        self.max_batch = max_batch
        self._fallback = None
        self._svf_smooth_sigma = svf_smooth_sigma
        vxm_cfg = vxm_config_from(cfg, svf_smooth_sigma)
        self.vxm_cfg = vxm_cfg
        # int8 activation scales (scalars, replicated): sidecar-provided or
        # lazily calibrated on the first predicted chunk (register.py parity);
        # lazily-calibrated scales persist to ``quant_sidecar`` when given
        self.quant_scales = quant_scales
        self.quant_sidecar = quant_sidecar
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

    def _variables(self, m, f):
        if not self.vxm_cfg.quantize:
            return self.params
        if self.quant_scales is None:
            from multimodal_registration_tpu.infer.register import persist_quant_sidecar
            from multimodal_registration_tpu.models.quantize import calibrate_scales

            scales = calibrate_scales(self.vxm_cfg, self.params, [(m, f)])
            persist_quant_sidecar(self.quant_sidecar, scales)
            self.quant_scales = jax.device_put(scales, self._repl)
        return {**self.params, "quant": self.quant_scales}

    def predict(self, mov: np.ndarray, fx: np.ndarray, strict: bool = False):
        """(B, X, Y, Z) arrays → (moved, warp_at_int_res).

        B is padded up to a multiple of the ``data`` axis; X not divisible by
        ``space * 16`` falls back to the unsharded registrar (raises instead
        when ``strict``)."""
        space = self.mesh.shape["space"]
        data = self.mesh.shape["data"]
        if mov.shape[1] % (space * 16):
            msg = (
                f"volume X dim {mov.shape[1]} not divisible by space axis "
                f"({space}) x 16"
            )
            if strict:
                raise ValueError(msg)
            warnings.warn(msg + " — falling back to single-device forward")
            if self._fallback is None:
                from multimodal_registration_tpu.infer.register import Registrar

                self._fallback = Registrar(
                    self.cfg, self.params, max_batch=self.max_batch,
                    svf_smooth_sigma=self._svf_smooth_sigma,
                    quant_scales=self.quant_scales,
                    quant_sidecar=self.quant_sidecar,
                )
            return self._fallback.predict(mov, fx)

        B = mov.shape[0]
        # fixed-size chunks, mirroring Registrar.predict's bounded-activation
        # contract: `max_batch` pairs per data-group per forward, scaled by
        # 1/space (each pair's activations are split over `space` devices) —
        # all tiles of a subvolume subject no longer ride one giant forward.
        chunk = data * max(1, self.max_batch // max(1, space))
        chunk = min(chunk, max(data, B + ((-B) % data)))
        moved_parts, warp_parts = [], []
        for s in range(0, B, chunk):
            m = np.asarray(mov[s : s + chunk], np.float32)
            f = np.asarray(fx[s : s + chunk], np.float32)
            n = m.shape[0]
            if n < chunk:  # pad so every chunk hits the same executable
                z = np.zeros((chunk - n, *m.shape[1:]), np.float32)
                m = np.concatenate([m, z])
                f = np.concatenate([f, z])
            mov_j = jax.device_put(
                jnp.asarray(m, jnp.float32)[..., None], self._vol_sharding
            )
            fx_j = jax.device_put(
                jnp.asarray(f, jnp.float32)[..., None], self._vol_sharding
            )
            out = self._apply(self._variables(mov_j, fx_j), mov_j, fx_j)
            moved_parts.append(np.asarray(out["moved"][..., 0])[:n])
            warp_parts.append(np.asarray(out["warp"])[:n])
        return (np.concatenate(moved_parts), np.concatenate(warp_parts))


def make_registrar(cfg: InferenceConfig, params, max_batch: int = 4,
                   svf_smooth_sigma: float | None = None, quant_scales=None,
                   quant_sidecar: str | None = None):
    """Build the registrar the inference config asks for.

    ``cfg.sharding`` = {} (or {"data": 1, "space": 1}) → the single-device
    :class:`Registrar`; anything larger → a :class:`ShardedRegistrar` over a
    ``(data, space)`` mesh (the user-facing multi-chip path — the reference's
    subvolume-mode analogue, `config_inference.json:2-4`). Raises if the
    requested layout needs more devices than exist.
    """
    from multimodal_registration_tpu.infer.register import Registrar

    data = int(cfg.sharding.get("data", 1) or 1)
    space = int(cfg.sharding.get("space", 1) or 1)
    if data * space <= 1:
        return Registrar(cfg, params, max_batch=max_batch,
                         svf_smooth_sigma=svf_smooth_sigma,
                         quant_scales=quant_scales,
                         quant_sidecar=quant_sidecar)
    n_avail = len(jax.devices())
    if data * space > n_avail:
        raise ValueError(
            f"sharding {{data: {data}, space: {space}}} needs {data * space} "
            f"devices, have {n_avail}"
        )
    from multimodal_registration_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data * space, space=space)
    return ShardedRegistrar(cfg, params, mesh, max_batch=max_batch,
                            svf_smooth_sigma=svf_smooth_sigma,
                            quant_scales=quant_scales,
                            quant_sidecar=quant_sidecar)
