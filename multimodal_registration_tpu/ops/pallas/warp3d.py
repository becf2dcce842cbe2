"""Pallas trilinear-warp kernel — status note (no kernel, by measurement).

SUPERSEDED (round 2): the hot warp does not need — and on this backend
cannot productively use — a Pallas kernel. ``ops/warp.py``'s XLA design
packs 2x2x2xC corner neighborhoods into single rows and slabs the packed
source along X so every gather's PADDED size (rows tile to 128 lanes —
PERF.md round 2b) stays under the ~500 MB cliff. Measured at 192^3: the
C=1 moved-image warp runs at 31 ms inside the flagship model (~230 M
rows/s, at the gather engine's fast-tier rate), full forward 130 ms.

Mosaic probe history (re-probed each round, ``benchmarks/probe_mosaic.py``
and ``benchmarks/pallas_gather_perf.py``):

  * round 1: in-kernel ``jnp.take`` (flat) → ``NotImplementedError: Only 2D
    gather is supported``; 2-D ``take_along_axis`` (either axis) → remote
    ``tpu_compile_helper`` internal error (HTTP 500); XLA-level block gather
    OOMs from (8,128) layout padding.
  * round 2 (2026-08-16): ``take_along_axis`` now COMPILES on both axes, but
    the Mosaic gather lowering asserts ``indices.shape == operand.shape +
    (1,)`` — the gather source block must have the SAME shape as the index
    block. Consequences for a warp kernel:
      - a per-element (row, lane) gather cannot address a whole
        VMEM-resident volume (28 MB at 192^3 C=1 fits VMEM, but the source
        block would have to equal the index block's shape);
      - in any flattened 2-D layout, one spatial axis's displacement
        multiplies by the minor-axis extent (±8 voxels of x = ±1536 rows in
        (X·Y, Z) layout), so same-shape halo blocks waste >10x;
      - exact trilinear cannot be decomposed into per-axis 1-D gather
        passes: the corner indices are functions of the OUTPUT voxel, and
        sequential passes evaluate them at the wrong intermediate points
        (the tensor-product-resampling fallacy).

Re-probe only if the lowering gains true 2-index gathers or
``dynamic_slice`` inside kernels (also unsupported, probed round 2).
"""
