"""U-Net backward attribution: WHICH adjoint makes conv-bwd 6x conv-fwd?

bwd_breakdown.py (round 3) put the model backward at 192 ms of which
integrate accounts for ~51 — leaving ~140 ms for a U-Net whose forward is
~23 ms. A conv stack's backward should cost ~2x its forward (dgrad + wgrad).
Suspects, each timed fwd vs value_and_grad at the reference workload
(160x160x192, enc [64]x4 / dec [64]x6, bf16):

  first_conv      — 2->64 conv alone (full-res activation, both directions)
  first_convpool  — conv + leaky + 2x max-pool (adds SelectAndScatter bwd)
  pool_only       — max-pool of a 64-ch full-res tensor (isolates
                    SelectAndScatter, XLA's max-pool adjoint)
  enc_rest        — encoder levels 2..4 (half-res and below)
  dec_stack       — decoder convs + nearest-upsample adjoints
  unet_full       — the whole U-Net (cross-check vs the sum)

Usage: unet_bwd_probe.py [iters] [--small]
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

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from multimodal_registration_tpu.models.unet import Unet


def timed(fn, *args, iters=6):
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    return (time.time() - t0) / iters * 1000


def fwd_vs_bwd(name, model, x, res, iters):
    # each section survives remote-compile failures (HTTP 413 observed on
    # this tunnel for some adjoint HLOs) so later sections still run
    try:
        params = model.init(jax.random.PRNGKey(0), x)

        def scalar(p):
            return jnp.sum(model.apply(p, x).astype(jnp.float32))

        f = jax.jit(scalar)
        vg = jax.jit(jax.value_and_grad(scalar))
        res[f"{name}_fwd_ms"] = round(timed(f, params, iters=iters), 1)
        res[f"{name}_fwd_bwd_ms"] = round(timed(vg, params, iters=iters), 1)
        res[f"{name}_bwd_ms"] = round(
            res[f"{name}_fwd_bwd_ms"] - res[f"{name}_fwd_ms"], 1)
    except Exception as e:  # noqa: BLE001 - probe records failures
        res[f"{name}_error"] = str(e)[:160]
    print(json.dumps({k: res[k] for k in res if k.startswith(name)}),
          flush=True)


class ConvLeaky(nn.Module):
    feats: tuple = (64,)
    pool: str = "none"  # none | xla (nn.max_pool) | reshape (ops/pool.py)

    @nn.compact
    def __call__(self, x):
        from multimodal_registration_tpu.ops.pool import max_pool_2x

        x = x.astype(jnp.bfloat16)
        for i, f in enumerate(self.feats):
            x = nn.Conv(f, (3, 3, 3), padding="SAME", dtype=jnp.bfloat16,
                        param_dtype=jnp.float32, name=f"c{i}")(x)
            x = nn.leaky_relu(x, negative_slope=0.2)
            if self.pool == "xla":
                x = nn.max_pool(x, (2, 2, 2), (2, 2, 2))
            elif self.pool == "reshape":
                x = max_pool_2x(x)
        return x


def main(iters=6, small=False):
    shape = (32, 32, 48) if small else (160, 160, 192)
    rng = np.random.default_rng(0)
    res = {"shape": list(shape)}
    x2 = jnp.asarray(rng.normal(size=(1, *shape, 2)).astype(np.float32))

    # the full U-Net first (now on the reshape pool) — the headline number
    fwd_vs_bwd("unet_full",
               Unet(enc_nf=(64,) * 4, dec_nf=(64,) * 6, nb_upsample_skips=1),
               x2, res, iters)

    fwd_vs_bwd("first_conv", ConvLeaky((64,)), x2, res, iters)
    # XLA pool adjoint (SelectAndScatter) vs the reshape pool's select chain
    fwd_vs_bwd("first_convpool", ConvLeaky((64,), pool="xla"), x2, res, iters)
    fwd_vs_bwd("first_convrpool", ConvLeaky((64,), pool="reshape"), x2, res,
               iters)

    half = tuple(s // 2 for s in shape)
    xh = jnp.asarray(
        rng.normal(size=(1, *half, 64)).astype(np.float32))
    fwd_vs_bwd("enc_rest", ConvLeaky((64, 64, 64), pool="reshape"), xh, res,
               iters)
    print(json.dumps(res))


if __name__ == "__main__":
    argv = list(sys.argv[1:])
    small = "--small" in argv
    if small:
        argv.remove("--small")
    main(int(argv[0]) if argv else 6, small=small)
