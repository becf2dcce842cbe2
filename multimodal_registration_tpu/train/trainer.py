"""SynthMorph training loop — pjit over a device mesh with fused on-device
synthesis.

Parity target: the training driver + hot loop of `train_synthmorph.py:168-344`
(SURVEY §3.1). Differences by design (TPU-first):

  * label-map → image synthesis runs **inside the jitted train step** (the
    reference synthesizes in-graph too, but feeds label maps from a host
    generator each step; here the whole label-map bank lives in HBM and the
    step gathers from it, so the input pipeline is never host-bound),
  * data parallelism = batch sharding over a ``Mesh('data','space')`` with
    XLA-inserted gradient all-reduce over ICI (vs ``MirroredStrategy``,
    `train_synthmorph.py:284-285`),
  * checkpointing via Orbax with an ``.npz`` portable export and an h5 import
    shim for the published pretrained models (`README.md:89-91`).

Loss parity (`train_synthmorph.py:301-308`): ``dice(map_2, pred) + 1`` (the
zero-pad-masked variant when zero-border augmentation is on) plus
``Grad('l2', reg_param)`` on the full-resolution integrated flow.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from multimodal_registration_tpu.losses import dice_loss, dice_loss_zeropad, grad_loss
from multimodal_registration_tpu.models.vxm_dense import VxmConfig, VxmDense
from multimodal_registration_tpu.ops.field import compose_fields_batch
from multimodal_registration_tpu.ops.resize import rescale_field
from multimodal_registration_tpu.ops.warp import warp_onehot
from multimodal_registration_tpu.parallel.mesh import make_mesh
from multimodal_registration_tpu.synth.augment import maybe_zero_borders, random_flips
from multimodal_registration_tpu.ops.integrate import integrate_svf_batch
from multimodal_registration_tpu.synth.image_engine import (
    ImageEngineConfig,
    draw_svf_small,
    labels_to_image,
    labels_to_image_full,
    reduced_svf_grid,
)
from multimodal_registration_tpu.train.config import TrainConfig


def engine_config_from(cfg: TrainConfig) -> ImageEngineConfig:
    return ImageEngineConfig(
        num_labels=cfg.num_labels,
        vel_std=cfg.vel_std,
        vel_res=cfg.vel_res,  # lists tuple-ized by ImageEngineConfig.__post_init__
        bias_std=cfg.bias_std,
        bias_res=cfg.bias_res,
        blur_std=cfg.blur_std,
        gamma=cfg.gamma,
        svf_int_res=cfg.svf_int_res,
    )


def vxm_config_from(cfg: TrainConfig) -> VxmConfig:
    return VxmConfig(
        enc=tuple(cfg.enc),
        dec=tuple(cfg.dec),
        int_steps=cfg.int_steps,
        int_res=cfg.int_res,
        svf_res=cfg.svf_res,
        compute_dtype=cfg.compute_dtype,
    )


def make_loss_fn(model: VxmDense, engine_cfg: ImageEngineConfig, cfg: TrainConfig,
                 zero_borders: bool):
    """Build the per-batch loss: augment → synthesize → register → Dice+Grad."""

    use_zeropad = cfg.zero_borders_maps or cfg.zero_borders_maps_val

    def synthesize(key, src_lab, trg_lab):
        in_shape = tuple(src_lab.shape[1:4])
        reduced = reduced_svf_grid(in_shape, engine_cfg)
        pd = (jnp.dtype(engine_cfg.integrate_payload_dtype)
              if engine_cfg.integrate_payload_dtype else None)

        def augment(k, s, t):
            k_flip, k_zb_s, k_zb_t, k_g1, k_g2 = jax.random.split(k, 5)
            s, t = random_flips(k_flip, (s, t))
            if zero_borders:
                s = maybe_zero_borders(k_zb_s, s, cfg.zero_bord_scale, cfg.zero_bord_frac)
                t = maybe_zero_borders(k_zb_t, t, cfg.zero_bord_scale, cfg.zero_bord_frac)
            return s, t, k_g1, k_g2

        keys = jax.random.split(key, src_lab.shape[0])
        s, t, kg1, kg2 = jax.vmap(augment)(keys, src_lab, trg_lab)

        if reduced is not None:
            # pre-integrate BOTH generators' SVFs in ONE batched rolled loop
            # (2B fields) instead of two serialized per-sample loops — the
            # device trace showed the two ~42 ms integration whiles as the
            # step's biggest block (PERF.md round 3b). Keys consumed match
            # the in-engine draw exactly, so the fields are identical.
            draw = jax.vmap(
                lambda k: draw_svf_small(k, in_shape, engine_cfg)
            )
            svfs = jnp.concatenate([draw(kg1), draw(kg2)], axis=0)
            phis = integrate_svf_batch(svfs, engine_cfg.int_steps,
                                       payload_dtype=pd)
            B = src_lab.shape[0]
            ph1, ph2 = phis[:B], phis[B:]
            img1, _, raw1, phi1, phi1s = jax.vmap(
                lambda k, lab, p: labels_to_image_full(k, lab, engine_cfg, p)
            )(kg1, s, ph1)
            img2, map2 = jax.vmap(
                lambda k, lab, p: labels_to_image(k, lab, engine_cfg, p)
            )(kg2, t, ph2)
            return img1, raw1, phi1, phi1s, img2, map2

        def per_sample(k_g1, k_g2, s, t):
            # src: raw labels + generator field (for the composed label warp);
            # trg: the SOFT one-hot target for the Dice loss
            img1, _, raw1, phi1, phi1s = labels_to_image_full(k_g1, s, engine_cfg)
            img2, map2 = labels_to_image(k_g2, t, engine_cfg)
            return img1, raw1, phi1, phi1s, img2, map2

        return jax.vmap(per_sample)(kg1, kg2, s, t)

    def loss_fn(params, key, src_lab, trg_lab):
        img1, raw1, phi1, phi1s, img2, map2 = synthesize(key, src_lab, trg_lab)
        out = model.apply(params, img1[..., None], img2[..., None])
        flow = out["flow_fullres"]
        full_shape = tuple(flow.shape[1:4])
        # Half-res compose (PERF.md round 3): phi1 is an upsample of the
        # generator's small-grid phi1s and flow an upsample of the model's
        # int-res warp, so when the two reduced grids coincide, composing at
        # the SMALL grid and upsampling the result once replaces the full-res
        # compose (64.5 ms fwd + 74.9 ms bwd at 160x160x192 — bwd_breakdown
        # r3) with a 1/8-size compose + one rescale (~6 ms). The two differ
        # only at second order (interpolating composed samples vs composing
        # interpolants); deviation is bounded by tests/test_train.py.
        # MMREG_ZLINE_COMPOSE is a measurement flag for the full-res z-line
        # compose; it must DISABLE the half-res branch, else it would be
        # silently preempted and the probe would time the wrong path.
        zline_compose = os.environ.get("MMREG_ZLINE_COMPOSE", "0") == "1"
        warp_grid = tuple(out["warp"].shape[1:4])
        phi_grid = tuple(phi1s.shape[1:4]) if phi1s is not None else None
        # Grid bridge for svf_int_res > int_res (e.g. generator integrated at
        # /4, model warp at /2): the generator grid is a uniform integer
        # coarsening of the warp grid, so one cheap small-grid upsample (with
        # the vectors rescaled into warp-grid units) re-enables the reduced
        # compose instead of falling back to the full-res path.
        ratios = (
            set(w // p for w, p in zip(warp_grid, phi_grid))
            if phi_grid is not None
            and all(w % p == 0 for w, p in zip(warp_grid, phi_grid))
            else set()
        )
        if (
            cfg.compose_res > 1
            and not zline_compose
            and phi1s is not None
            and len(ratios) == 1
        ):
            k = ratios.pop()
            if k > 1:
                phi1s = jax.vmap(
                    lambda v: rescale_field(v, float(k), out_shape=warp_grid)
                )(phi1s)
            total_half = compose_fields_batch(phi1s, out["warp"])
            f = tuple(o / h for o, h in zip(full_shape, total_half.shape[1:4]))
            total_field = jax.vmap(
                lambda v: rescale_field(v, f, out_shape=full_shape)
            )(total_half)
        else:
            # Full-res compose fallback (compose_res=1, mismatched grids, or
            # no reduced generator field). prediction = SOFT one-hot of the
            # raw source labels warped by the COMPOSED generator+model field.
            # Reference semantics are the sequential pair gen-warp(map) →
            # model-warp(map_1) (train_synthmorph.py:298); composing the
            # fields first gives the same transform with a single
            # interpolation, and lets warp_onehot gather only the 1-channel
            # integer map instead of all L one-hot channels.
            # batched compose (NOT vmap(compose_fields)): keeps the chunked
            # warp's halo cond above the batch so both branches don't execute.
            # bf16 payload (cfg.compose_payload_dtype) halves gather bytes →
            # halo 16 fits the slab budget (gen fields reach ~10 voxels; the
            # f32 plan's halo 8 would fall back to the whole-volume gather).
            cpd = jnp.dtype(cfg.compose_payload_dtype) if cfg.compose_payload_dtype else None
            if zline_compose:
                # z-line row-reduction compose (ops/warp_zline.py): the gather
                # coordinates are the MODEL flow (smooth), so the fast path
                # holds even under large generator fields; guarded exact
                # fallback.
                from multimodal_registration_tpu.ops.warp_zline import (
                    compose_fields_zline_batch,
                )

                total_field = compose_fields_zline_batch(phi1, flow, payload_dtype=cpd)
            elif cpd is not None:
                # gathered phi1 values in cpd; the + flow accumulation is f32
                total_field = compose_fields_batch(phi1.astype(cpd), flow).astype(
                    jnp.float32
                )
            else:
                total_field = compose_fields_batch(phi1, flow)
        pred = jax.vmap(
            lambda l, f: warp_onehot(l, f, engine_cfg.num_labels)
        )(raw1, total_field)
        d = dice_loss_zeropad(map2, pred) if use_zeropad else dice_loss(map2, pred)
        # grad_res=2: penalize the int-res warp — fine-grid forward diffs of
        # the exact 2x interleave upsample equal the coarse ones, so this is
        # the same loss up to boundary terms (ratio 1.056, see
        # train/config.py), and it lets XLA DCE the full-res flow rescale +
        # its VJP out of the step (the Dice term uses the bridged compose,
        # not flow_fullres).
        if (
            cfg.grad_res > 1
            and tuple(out["warp"].shape[1:4])
            == tuple(s // cfg.grad_res for s in full_shape)
        ):
            g = grad_loss(out["warp"], "l2", cfg.reg_param)
        else:
            g = grad_loss(flow, "l2", cfg.reg_param)
        loss = d + 1.0 + g
        return loss, {"dice_loss": d, "grad_loss": g, "loss": loss}

    return loss_fn


class Trainer:
    """Owns mesh, model, optimizer, compiled steps, and checkpoints."""

    def __init__(self, cfg: TrainConfig, mesh=None):
        if os.environ.get("MMREG_FUSED_FIRST_CONV", "0") == "1":
            # the fused first-conv Pallas kernel has no VJP — under
            # value_and_grad it fails deep in AD with an opaque transpose
            # error; fail early with the actionable message instead.
            raise RuntimeError(
                "MMREG_FUSED_FIRST_CONV=1 is inference-only (the Pallas "
                "kernel has no custom VJP); unset it before training"
            )
        self.cfg = cfg
        if mesh is None:
            n_dev = cfg.num_devices
            if n_dev is None:
                # largest device count that divides the batch (parity with the
                # reference's divisibility assert, train_synthmorph.py:193-194,
                # but auto-sized instead of failing)
                avail = len(jax.devices())
                n_dev = max(n for n in range(1, avail + 1) if cfg.batch_size % n == 0)
            mesh = make_mesh(n_dev)
        self.mesh = mesh
        self.vxm_cfg = vxm_config_from(cfg)
        self.engine_cfg = engine_config_from(cfg)
        self.model = VxmDense(cfg=self.vxm_cfg)
        if cfg.grad_clip_norm and cfg.grad_clip_norm > 0:
            self.optimizer = optax.chain(
                optax.clip_by_global_norm(cfg.grad_clip_norm), optax.adam(cfg.lr)
            )
        else:
            self.optimizer = optax.adam(cfg.lr)

        self._repl = NamedSharding(self.mesh, P())
        self._batched = NamedSharding(self.mesh, P("data"))

        loss_tr = make_loss_fn(self.model, self.engine_cfg, cfg, cfg.zero_borders_maps)
        loss_val = make_loss_fn(self.model, self.engine_cfg, cfg, cfg.zero_borders_maps_val)

        def train_step(params, opt_state, key, src, trg):
            (loss, aux), grads = jax.value_and_grad(loss_tr, has_aux=True)(
                params, key, src, trg
            )
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, aux

        def val_step(params, key, src, trg):
            _, aux = loss_val(params, key, src, trg)
            return aux

        # batch shardings are inherited from put_batch placement (data-sharded
        # when divisible by the mesh, replicated otherwise, e.g. val batch 1)
        self.train_step = jax.jit(
            train_step,
            in_shardings=(self._repl, self._repl, self._repl, None, None),
            out_shardings=(self._repl, self._repl, self._repl),
            donate_argnums=(0, 1),
        )
        self.val_step = jax.jit(
            val_step,
            in_shardings=(self._repl, self._repl, None, None),
            out_shardings=self._repl,
        )

        # banked variants: the whole label-map bank stays HBM-resident and the
        # step gathers (bank[idx]) on device — no per-step host→device volume
        # transfer (the reference feeds label maps from a host generator every
        # batch, train_synthmorph.py:117-165)
        def train_step_banked(params, opt_state, key, bank, src_idx, trg_idx):
            return train_step(params, opt_state, key, bank[src_idx], bank[trg_idx])

        def val_step_banked(params, key, bank, src_idx, trg_idx):
            return val_step(params, key, bank[src_idx], bank[trg_idx])

        # idx shardings are inherited from put_indices placement (data-sharded
        # when divisible → the gathered batch is sharded too)
        self.train_step_banked = jax.jit(
            train_step_banked,
            in_shardings=(self._repl, self._repl, self._repl, self._repl, None, None),
            out_shardings=(self._repl, self._repl, self._repl),
            donate_argnums=(0, 1),
        )
        self.val_step_banked = jax.jit(
            val_step_banked,
            in_shardings=(self._repl, self._repl, self._repl, None, None),
            out_shardings=self._repl,
        )

    # -- state ---------------------------------------------------------------
    def init_state(self, seed: Optional[int] = None):
        key = jax.random.PRNGKey(self.cfg.seed if seed is None else seed)
        in_shape = tuple(self.cfg.in_shape)
        dummy = jnp.zeros((1, *in_shape, 1), jnp.float32)
        params = self.model.init(key, dummy, dummy)
        params = jax.device_put(params, self._repl)
        opt_state = jax.device_put(self.optimizer.init(params), self._repl)
        return params, opt_state

    def put_batch(self, src: np.ndarray, trg: np.ndarray):
        n = self.mesh.shape["data"]
        sh = self._batched if src.shape[0] % n == 0 else self._repl
        return jax.device_put(src, sh), jax.device_put(trg, sh)

    def put_bank(self, maps: np.ndarray):
        """Upload the full label-map bank (N, X, Y, Z) uint8, replicated."""
        return jax.device_put(np.ascontiguousarray(maps), self._repl)

    def put_indices(self, src_idx: np.ndarray, trg_idx: np.ndarray):
        n = self.mesh.shape["data"]
        sh = self._batched if src_idx.shape[0] % n == 0 else self._repl
        return (
            jax.device_put(np.asarray(src_idx, np.int32), sh),
            jax.device_put(np.asarray(trg_idx, np.int32), sh),
        )

    # -- checkpoints ---------------------------------------------------------
    def save_checkpoint(self, path: str, params, opt_state=None, epoch: int = 0):
        """Orbax checkpoint dir + portable flat .npz alongside."""
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        ckptr = ocp.PyTreeCheckpointer()
        payload = {"params": params, "epoch": np.asarray(epoch)}
        if opt_state is not None:
            payload["opt_state"] = opt_state
        ckptr.save(path, payload, force=True)
        # flat npz export (shape-agnostic conv weights; portable archive)
        flat = _flatten_params(params)
        np.savez(path + ".npz", **flat)

    def load_checkpoint(self, path: str, with_opt: bool = False):
        params, opt_state, epoch = load_checkpoint_any(path, self)
        params = jax.device_put(params, self._repl)
        if with_opt and opt_state is not None:
            opt_state = jax.device_put(opt_state, self._repl)
            return params, opt_state, epoch
        return params, None, epoch


def _flatten_params(params) -> dict:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        out[name] = np.asarray(leaf)
    return out


def _unflatten_params(template, flat: dict):
    leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for path, leaf in leaves:
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        if name not in flat:
            raise KeyError(f"missing param {name} in checkpoint")
        arr = np.asarray(flat[name])
        if arr.shape != leaf.shape:
            raise ValueError(f"shape mismatch for {name}: {arr.shape} vs {leaf.shape}")
        new_leaves.append(jnp.asarray(arr, leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def load_checkpoint_any(path: str, trainer: "Trainer"):
    """Load orbax dir, .npz flat archive, or Keras .h5 (pretrained import)."""
    from multimodal_registration_tpu.models.vxm_dense import params_template as _tmpl

    params_template = _tmpl(trainer.vxm_cfg)
    if path.endswith(".npz"):
        flat = dict(np.load(path))
        return _unflatten_params(params_template, flat), None, 0
    if path.endswith((".h5", ".hdf5")):
        from multimodal_registration_tpu.models.h5_import import import_keras_vxm_h5

        params = import_keras_vxm_h5(path, params_template, trainer.vxm_cfg)
        return params, None, 0
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(os.path.abspath(path))
    params = restored["params"]
    return params, restored.get("opt_state"), int(np.asarray(restored.get("epoch", 0)))
