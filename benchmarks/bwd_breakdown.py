"""Backward-pass attribution at the reference training workload.

`train_breakdown.py` (round-3 block) put the step's backward at 283 ms
(model 236.5 / loss-tail 46.7) — above the 35% custom-VJP go-threshold
(VERDICT r3 #3). Before writing a VJP, attribute WHICH adjoint dominates:
each component below is timed forward-only and under value_and_grad at its
in-training shape; the difference is that component's backward cost.

Components (training shapes, 160x160x192 / 26 labels / int res 2):
  unet      — conv stack fwd+bwd w.r.t. params (both 1-ch inputs)
  integrate — scaling-and-squaring (5 steps) at 80x80x96x3, grad w.r.t. svf
  rescale   — half->full field upsample, grad w.r.t. the half-res field
  compose   — compose_fields_batch(phi_gen, flow), grad w.r.t. flow
              (phi_gen constant — mirrors training where it has no params)
  onehot    — warp_onehot(labels, flow, 26), grad w.r.t. flow
  dice+reg  — the loss tail scalars

Usage: bwd_breakdown.py [iters] [--small]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from multimodal_registration_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import os

import jax

if os.environ.get("MMREG_FORCE_CPU", "0") == "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from multimodal_registration_tpu.losses import dice_loss_zeropad, grad_loss
from multimodal_registration_tpu.models.vxm_dense import VxmConfig, VxmDense
from multimodal_registration_tpu.ops.field import compose_fields_batch
from multimodal_registration_tpu.ops.integrate import integrate_svf
from multimodal_registration_tpu.ops.resize import rescale_field
from multimodal_registration_tpu.ops.warp import warp_onehot


def timed(fn, *args, iters=8):
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    return (time.time() - t0) / iters * 1000


def main(iters=8, small=False):
    shape = (32, 32, 48) if small else (160, 160, 192)
    L = 8 if small else 26
    r = 2
    half = tuple(s // r for s in shape)
    rng = np.random.default_rng(0)
    res = {"shape": list(shape)}

    # --- unet (full model fwd minus integrate/rescale tail would need
    # surgery; instead: the whole model.apply vs params — the integrate +
    # rescale adjoints are measured separately below and subtracted) ---
    cfg = VxmConfig()
    model = VxmDense(cfg=cfg)
    key = jax.random.PRNGKey(0)
    m = jnp.asarray(rng.normal(size=(1, *shape, 1)).astype(np.float32))
    f = jnp.asarray(rng.normal(size=(1, *shape, 1)).astype(np.float32))
    params = model.init(key, m, f)

    def model_scalar(p):
        out = model.apply(p, m, f)
        return jnp.sum(out["flow_fullres"].astype(jnp.float32))

    fwd = jax.jit(model_scalar)
    vg = jax.jit(jax.value_and_grad(model_scalar))
    res["model_fwd_ms"] = round(timed(fwd, params, iters=iters), 1)
    res["model_fwd_bwd_ms"] = round(timed(vg, params, iters=iters), 1)
    res["model_bwd_ms"] = round(res["model_fwd_bwd_ms"] - res["model_fwd_ms"], 1)
    print(json.dumps({k: res[k] for k in list(res)[-3:]}), flush=True)

    # --- integrate at half res ---
    svf = jnp.asarray(rng.normal(size=(*half, 3)).astype(np.float32)) * 2.0

    def integ_scalar(v):
        return jnp.sum(integrate_svf(v, 5, payload_dtype=jnp.bfloat16)
                       .astype(jnp.float32))

    fwd = jax.jit(integ_scalar)
    vg = jax.jit(jax.value_and_grad(integ_scalar))
    res["integrate_fwd_ms"] = round(timed(fwd, svf, iters=iters), 1)
    res["integrate_fwd_bwd_ms"] = round(timed(vg, svf, iters=iters), 1)
    res["integrate_bwd_ms"] = round(
        res["integrate_fwd_bwd_ms"] - res["integrate_fwd_ms"], 1)
    print(json.dumps({k: res[k] for k in list(res)[-3:]}), flush=True)

    # --- rescale half -> full ---
    phi_half = jnp.asarray(rng.normal(size=(*half, 3)).astype(np.float32))

    def rescale_scalar(v):
        return jnp.sum(rescale_field(v, float(r), out_shape=shape))

    fwd = jax.jit(rescale_scalar)
    vg = jax.jit(jax.value_and_grad(rescale_scalar))
    res["rescale_fwd_ms"] = round(timed(fwd, phi_half, iters=iters), 1)
    res["rescale_fwd_bwd_ms"] = round(timed(vg, phi_half, iters=iters), 1)
    res["rescale_bwd_ms"] = round(
        res["rescale_fwd_bwd_ms"] - res["rescale_fwd_ms"], 1)
    print(json.dumps({k: res[k] for k in list(res)[-3:]}), flush=True)

    # --- compose (grad w.r.t. flow only, phi constant) ---
    phi = jnp.asarray((rng.normal(size=(1, *shape, 3)) * 3).astype(np.float32))
    flow = jnp.asarray((rng.normal(size=(1, *shape, 3)) * 2).astype(np.float32))

    def compose_scalar(fl):
        out = compose_fields_batch(phi.astype(jnp.bfloat16), fl)
        return jnp.sum(out.astype(jnp.float32))

    fwd = jax.jit(compose_scalar)
    vg = jax.jit(jax.value_and_grad(compose_scalar))
    res["compose_fwd_ms"] = round(timed(fwd, flow, iters=iters), 1)
    res["compose_fwd_bwd_ms"] = round(timed(vg, flow, iters=iters), 1)
    res["compose_bwd_ms"] = round(
        res["compose_fwd_bwd_ms"] - res["compose_fwd_ms"], 1)
    print(json.dumps({k: res[k] for k in list(res)[-3:]}), flush=True)

    # --- warp_onehot (grad w.r.t. flow) ---
    lab = jnp.asarray(rng.integers(0, L, size=shape, dtype=np.int32))
    flow1 = flow[0]

    def onehot_scalar(fl):
        return jnp.sum(warp_onehot(lab, fl, L))

    fwd = jax.jit(onehot_scalar)
    vg = jax.jit(jax.value_and_grad(onehot_scalar))
    res["onehot_fwd_ms"] = round(timed(fwd, flow1, iters=iters), 1)
    res["onehot_fwd_bwd_ms"] = round(timed(vg, flow1, iters=iters), 1)
    res["onehot_bwd_ms"] = round(
        res["onehot_fwd_bwd_ms"] - res["onehot_fwd_ms"], 1)
    print(json.dumps({k: res[k] for k in list(res)[-3:]}), flush=True)

    # --- dice + reg tail ---
    a = jnp.abs(jnp.asarray(rng.normal(size=(1, *shape, L)).astype(np.float32)))
    b = jnp.abs(jnp.asarray(rng.normal(size=(1, *shape, L)).astype(np.float32)))

    def tail_scalar(pred, fl):
        return dice_loss_zeropad(a, pred) + grad_loss(fl, "l2", 0.02)

    # the tail HLO has blown the remote compiler's request-size cap before
    # (HTTP 413, r3 run) — record the failure instead of losing the rest
    try:
        fwd = jax.jit(tail_scalar)
        vg = jax.jit(jax.value_and_grad(tail_scalar, argnums=(0, 1)))
        res["tail_fwd_ms"] = round(timed(fwd, b, flow, iters=iters), 1)
        res["tail_fwd_bwd_ms"] = round(timed(vg, b, flow, iters=iters), 1)
        res["tail_bwd_ms"] = round(res["tail_fwd_bwd_ms"] - res["tail_fwd_ms"], 1)
    except Exception as e:  # noqa: BLE001 - probe records failures
        res["tail_error"] = str(e)[:200]
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    argv = list(sys.argv[1:])
    small = "--small" in argv
    if small:
        argv.remove("--small")
    main(int(argv[0]) if argv else 8, small=small)
