"""Pallas trilinear-warp kernel — status note.

SUPERSEDED (round 2, 2026-08-16): the hot warp no longer needs a Pallas
kernel. ``benchmarks/gather_probe.py`` showed this backend's XLA gather rate
is governed by the gather SOURCE size (~110 M rows/s under ~100 MB, ~6x
collapse above ~200 MB), so ``ops/warp.py`` now packs 2x2x2xC corner
neighborhoods into single rows and slabs the packed source along X under
``lax.map`` so every gather stays under the budget: 369 ms → 74 ms at
192^3 x 3ch — within ~15% of the measured gather-engine floor
(7.1 M rows / 110 M rows/s ≈ 64 ms). The backward inherits the same slab
structure through autodiff (train step 2.75 → 0.96 s at 160x160x192/26).

Mosaic probe history (re-probed each round via ``benchmarks/probe_mosaic.py``):

  * round 1 (2026-08-16): in-kernel ``jnp.take`` (flat gather) →
    ``NotImplementedError: Only 2D gather is supported`` (Mosaic);
    2-D ``take_along_axis`` (either axis) → remote ``tpu_compile_helper``
    internal error (HTTP 500); XLA-level block gather OOMs from (8,128)
    layout padding.
  * round 2: see the probe-result JSON lines appended to PERF.md after each
    ``benchmarks/probe_mosaic.py`` run.

A hand-written Pallas kernel (slab DMA + in-VMEM arithmetic) could in
principle beat the 64 ms gather-engine floor by computing the trilinear
blend from a VMEM-resident slab without the gather unit, but with the XLA
path at 74 ms the marginal win no longer justifies it while Mosaic gathers
remain uncompilable on this backend.
"""
