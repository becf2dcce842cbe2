"""Pallas TPU kernels (currently: design notes; see warp3d).

The hot op of the framework is the trilinear warp (PERF.md ablation: ~80% of
inference time via XLA gathers). A Mosaic kernel is the planned fix, but
in-kernel gathers do not compile on the current backend — status and the
intended design are documented in :mod:`warp3d`.
"""
