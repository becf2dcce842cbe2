"""TPU probe: separable Gaussian-blur lowerings at the training shape.

The synthesis residual after the round-3c fixes (~95 ms of the 237.6 ms
synthesis) includes two full-res blurs per step (src + trg images,
`synth/image_engine.py` step 4, parity `ne.models.labels_to_image`'s
blur stage). The traffic floor for one (160,160,192) f32 separable blur is
~0.6 ms; this probe times the two candidate lowerings head-to-head:

  convolve — per-column ``jnp.convolve`` via vmap (batched 1-D conv +
             transposes per axis; the historical default)
  shifts   — pad + 2r+1 static-slice multiply-adds per axis (pure VPU)

and checks exactness between them. Usage: blur_probe.py [iters] [--small]
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

from multimodal_registration_tpu.synth.image_engine import (
    _gaussian_blur_convolve,
    _gaussian_blur_shifts,
)


def timed(fn, *args, iters=16):
    out = fn(*args)
    float(jnp.sum(out))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.time() - t0) / iters * 1000


def main(iters=16, small=False):
    shape = (32, 32, 16) if small else (160, 160, 192)
    radius = 3
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    sigma = jnp.float32(0.7)
    res = {"shape": list(shape), "radius": radius}

    conv_j = jax.jit(lambda v, s: _gaussian_blur_convolve(v, s, radius))
    shift_j = jax.jit(lambda v, s: _gaussian_blur_shifts(v, s, radius))

    res["convolve_ms"] = round(timed(conv_j, img, sigma, iters=iters), 2)
    res["shifts_ms"] = round(timed(shift_j, img, sigma, iters=iters), 2)
    err = float(jnp.max(jnp.abs(conv_j(img, sigma) - shift_j(img, sigma))))
    res["maxerr"] = round(err, 8)
    print(json.dumps(res))


if __name__ == "__main__":
    argv = list(sys.argv[1:])
    small = "--small" in argv
    if small:
        argv.remove("--small")
    main(int(argv[0]) if argv else 16, small=small)
