"""Effective ``--one-cpu-tf`` host-thread pinning.

Reference semantics (`bids_registration.py:460-472`,
`bids_two_steps_registration.py:591-594`): pin TF to one intra/inter-op
thread per process so that ``sct_run_batch -jobs N`` worker processes don't
oversubscribe the host. The TPU-native equivalent is capping the XLA CPU
client's Eigen pool and the BLAS/OpenMP pools.

CRITICAL ORDERING: XLA reads ``XLA_FLAGS`` when the first backend client is
created (NOT at ``import jax``) — so this must run before any jax device API
call. The root CLI shims call :func:`apply_one_cpu_env` before importing the
inference modules, and this module must never import jax (the package
``__init__`` is lazy for exactly this reason).
"""

from __future__ import annotations

import os
import sys

_FLAG = "--one-cpu-tf"
_TRUTHY = ("1", "true", "yes")


def one_cpu_requested(argv) -> bool:
    """Parse ``--one-cpu-tf`` out of ``argv`` (default True, reference parity)."""
    for i, a in enumerate(argv):
        if a == _FLAG:
            return i + 1 < len(argv) and str(argv[i + 1]).lower() in _TRUTHY
        if a.startswith(_FLAG + "="):
            return a.split("=", 1)[1].lower() in _TRUTHY
    return True


def _backend_initialized() -> bool:
    if "jax" not in sys.modules:
        return False
    try:
        from jax._src import xla_bridge

        return bool(xla_bridge._backends)
    except Exception:
        return False


def apply_one_cpu_env(argv=None) -> bool:
    """Cap host thread pools if ``--one-cpu-tf`` is requested (or by default).

    Returns True iff the pinning env vars were applied. Safe to call more
    than once. With ``MMREG_ONECPU_PROBE=<path>`` set, dumps the env/backend
    state to that file and exits — used by the ordering regression test.
    """
    argv = sys.argv if argv is None else argv
    applied = one_cpu_requested(argv)
    if applied:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_cpu_multi_thread_eigen" not in flags:
            flags = (flags + " --xla_cpu_multi_thread_eigen=false").strip()
        os.environ["XLA_FLAGS"] = flags
        for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
            os.environ.setdefault(var, "1")
    probe = os.environ.get("MMREG_ONECPU_PROBE")
    if probe:
        import json

        with open(probe, "w") as f:
            json.dump(
                {
                    "applied": applied,
                    "xla_flags": os.environ.get("XLA_FLAGS", ""),
                    "jax_imported": "jax" in sys.modules,
                    "backend_initialized": _backend_initialized(),
                },
                f,
            )
        sys.exit(0)
    return applied
