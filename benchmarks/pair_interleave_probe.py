"""Two-pair software-pipelining probe for the flagship forward (VERDICT r3 #4).

The 192³ forward alternates an MXU-bound phase (U-Net convs, ~52 ms) and a
gather/HBM-bound phase (integrate + warps, ~66 ms). Naive batch=2 measured
0.87×/pair (round 3) — XLA does not overlap the phases across pairs by
itself. This probe asks whether it CAN: one jit computes two pairs with the
stages explicitly staged so pair B's convs are schedulable alongside pair
A's gathers (`lax.optimization_barrier` pins the stage boundaries), vs the
same two pairs traced sequentially, vs 2× the single-pair time.

The staged tail reproduces the model's exact post-SVF math (integrate at
int-res with bf16 payload, full-res rescale, packed-chunked warp); a one-off
allclose against `model.apply` guards the probe's honesty.

Verdict feeds PERF.md round 4: adopt a two-pair Registrar mode if the
interleave is ≥10% over 2× single-pair (headline ≥ 8.5 pairs/s), else record
the negative with the measured reason.

Ref hot loop: /root/reference/train_synthmorph.py:298,335-344.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from multimodal_registration_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_registration_tpu.models.vxm_dense import VxmConfig, VxmDense, init_params
from multimodal_registration_tpu.ops.integrate import integrate_svf
from multimodal_registration_tpu.ops.resize import rescale_field
from multimodal_registration_tpu.ops.warp import warp_batch

SHAPE = (192, 192, 192)
CFG = VxmConfig(enc=(64,) * 4, dec=(64,) * 6, int_steps=5, int_res=2,
                svf_res=2, compute_dtype="bfloat16")


def timed_chain(body, args, iters=8):
    """Per-call seconds. ``body(*args) -> scalar`` is wrapped in ONE jit that
    also feeds the scalar back into the inputs, so iterations chain on device
    with no eager per-iteration dispatch; drain via scalar readback
    (CLAUDE.md: block_until_ready is unreliable on this tunnel)."""

    @jax.jit
    def step(*a):
        s = body(*a).astype(jnp.float32) * 0.0
        return tuple(x + s for x in a) + (s,)

    cur = step(*args)
    float(cur[-1])
    cur = cur[:-1]
    t0 = time.time()
    for _ in range(iters):
        out = step(*cur)
        cur = out[:-1]
    float(out[-1])
    return (time.time() - t0) / iters


def main():
    model = VxmDense(cfg=CFG)
    params = init_params(CFG, inshape=(32, 32, 32), seed=0)
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(rng.random((1, *SHAPE, 1), np.float32))
    mov_a, fx_a, mov_b, fx_b = mk(), mk(), mk(), mk()

    def svf_of(mov, fx):
        # only the "svf" output is used -> XLA DCEs the model tail, leaving
        # the U-Net + flow head (the MXU phase)
        return model.apply(params, mov, fx)["svf"]

    def tail(svf, mov):
        # exact replica of the model's post-SVF path (vxm_dense.py:130-175)
        pd = jnp.dtype(CFG.integrate_payload_dtype)
        pos_flow = jax.vmap(
            lambda v: integrate_svf(v, CFG.int_steps, payload_dtype=pd)
        )(svf)
        factors = tuple(i / c for i, c in zip(SHAPE, pos_flow.shape[1:4]))
        flow_fullres = jax.vmap(
            lambda v: rescale_field(v, factors, out_shape=SHAPE)
        )(pos_flow)
        moved = warp_batch(mov.astype(jnp.float32), flow_fullres, interp="linear")
        return moved, pos_flow

    def full_pair(mov, fx):
        return tail(svf_of(mov, fx), mov)

    # --- honesty guard: staged tail == model.apply ---------------------
    small = (64, 64, 64)
    sm = jnp.asarray(rng.random((1, *small, 1), np.float32))
    sf = jnp.asarray(rng.random((1, *small, 1), np.float32))
    ref_out = jax.jit(lambda m, f: model.apply(params, m, f))(sm, sf)
    svf_s = jax.jit(svf_of)(sm, sf)
    pos_s = jax.vmap(
        lambda v: integrate_svf(v, CFG.int_steps,
                                payload_dtype=jnp.dtype(CFG.integrate_payload_dtype))
    )(svf_s)
    fac = tuple(i / c for i, c in zip(small, pos_s.shape[1:4]))
    ffr = jax.vmap(lambda v: rescale_field(v, fac, out_shape=small))(pos_s)
    mv_s = warp_batch(sm.astype(jnp.float32), ffr, interp="linear")
    np.testing.assert_allclose(np.asarray(mv_s), np.asarray(ref_out["moved"]),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(pos_s), np.asarray(ref_out["warp"]),
                               atol=1e-4)
    print(json.dumps({"staged_tail_matches_model": True}), flush=True)

    results = {}

    # --- 1 pair ---------------------------------------------------------
    def one(mov, fx):
        moved, w = full_pair(mov, fx)
        return jnp.sum(moved) + jnp.sum(w)

    t1 = timed_chain(one, (mov_a, fx_a))
    results["single_pair_ms"] = round(t1 * 1000, 1)
    print(json.dumps({"single_pair_ms": results["single_pair_ms"]}), flush=True)

    # --- naive batch=2 (round-3 reference point) -------------------------
    movs = jnp.concatenate([mov_a, mov_b])
    fxs = jnp.concatenate([fx_a, fx_b])

    def batch2(mov, fx):
        out = model.apply(params, mov, fx)
        return jnp.sum(out["moved"]) + jnp.sum(out["warp"])

    t2 = timed_chain(batch2, (movs, fxs))
    results["batch2_ms_per_pair"] = round(t2 * 1000 / 2, 1)
    print(json.dumps({"batch2_ms_per_pair": results["batch2_ms_per_pair"]}), flush=True)

    # --- two pairs, sequential trace, one jit ----------------------------
    def two_seq(ma, fa, mb, fb):
        moved_a, wa = full_pair(ma, fa)
        moved_b, wb = full_pair(mb, fb)
        return jnp.sum(moved_a) + jnp.sum(wa) + jnp.sum(moved_b) + jnp.sum(wb)

    t3 = timed_chain(two_seq, (mov_a, fx_a, mov_b, fx_b))
    results["two_seq_ms_per_pair"] = round(t3 * 1000 / 2, 1)
    print(json.dumps({"two_seq_ms_per_pair": results["two_seq_ms_per_pair"]}),
          flush=True)

    # --- two pairs, staged interleave ------------------------------------
    # stage 1: unet(A)
    # stage 2: unet(B) + tail(A)   <- MXU phase of B alongside gather phase of A
    # stage 3: tail(B)
    # optimization_barrier pins the boundaries so the scheduler sees exactly
    # this stage structure.
    def two_ppl(ma, fa, mb, fb):
        svf_a = svf_of(ma, fa)
        svf_a, mb2, fb2 = jax.lax.optimization_barrier((svf_a, mb, fb))
        svf_b = svf_of(mb2, fb2)
        moved_a, wa = tail(svf_a, ma)
        svf_b, moved_a, wa = jax.lax.optimization_barrier((svf_b, moved_a, wa))
        moved_b, wb = tail(svf_b, mb2)
        return jnp.sum(moved_a) + jnp.sum(wa) + jnp.sum(moved_b) + jnp.sum(wb)

    t4 = timed_chain(two_ppl, (mov_a, fx_a, mov_b, fx_b))
    results["two_interleaved_ms_per_pair"] = round(t4 * 1000 / 2, 1)
    print(json.dumps(
        {"two_interleaved_ms_per_pair": results["two_interleaved_ms_per_pair"]}),
        flush=True)

    # --- same staging WITHOUT barriers (let the scheduler roam) ----------
    def two_free(ma, fa, mb, fb):
        svf_a = svf_of(ma, fa)
        svf_b = svf_of(mb, fb)
        moved_a, wa = tail(svf_a, ma)
        moved_b, wb = tail(svf_b, mb)
        return jnp.sum(moved_a) + jnp.sum(wa) + jnp.sum(moved_b) + jnp.sum(wb)

    t5 = timed_chain(two_free, (mov_a, fx_a, mov_b, fx_b))
    results["two_free_ms_per_pair"] = round(t5 * 1000 / 2, 1)

    results["speedup_interleave_vs_2x_single"] = round(t1 / t4 * 2, 3)
    results["backend"] = jax.default_backend()
    print(json.dumps(results), flush=True)
    with open(__file__.replace(".py", "_results.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
