"""Pallas trilinear-warp kernel — design + feasibility status.

STATUS (round 1, 2026-08-16): BLOCKED on the current TPU backend. Probes:

  * in-kernel ``jnp.take`` (flat gather) →
    ``NotImplementedError: Only 2D gather is supported`` (Mosaic),
  * in-kernel 2-D ``take_along_axis`` (either axis) → remote
    ``tpu_compile_helper`` internal error (HTTP 500),
  * XLA-level ``lax.gather`` with ``slice_sizes=(2,2,2,C)`` → correct but the
    gather output's minor dims are layout-padded to (8,128) tiles, a ~20×
    memory expansion that OOMs at 192³ (this variant IS used on CPU, see
    ``ops.warp._sample_linear_blockgather``).

INTENDED DESIGN (to implement when Mosaic gathers land / backend updates):

  grid over output X-tiles; per tile:
    1. compute sample coords from the flow tile (VMEM),
    2. DMA an input slab ``[x0-H, x0+TX+H) × Y × Z`` from HBM into VMEM
       (halo H bounds the displacement; runtime max-|u| check falls back to
       the XLA path when exceeded),
    3. z-axis resolution via a banded one-hot matrix multiplied on the MXU
       (gather-free: out_row = P @ slab_row with P holding the two trilinear
       z-weights per output position),
    4. x/y corners via dynamic slab slices + VPU select-accumulate.

  Cost model: slab DMA ≈ (TX+2H)·Y·Z·dtype bytes per tile (sequential HBM
  reads at full bandwidth instead of random-access gathers) + one 128×128
  matmul per slab row. Target: ≥10× over the XLA gather (369 ms → ≤40 ms at
  192³×3ch).

Until then, the public API (:func:`multimodal_registration_tpu.ops.warp.warp`)
uses the XLA 8-gather formulation on TPU.
"""
