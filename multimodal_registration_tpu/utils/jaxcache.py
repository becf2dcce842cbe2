"""Persistent XLA compilation cache.

Compiles on the TPU backend cost tens of seconds each; the inference CLIs are
short-lived processes, so without a persistent cache every invocation would
recompile (the reference pays an analogous price rebuilding Keras graphs per
volume shape, `bids_registration.py:303-312`). One call makes all jit misses
hit disk first.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.environ.get(
    "MMREG_JAX_CACHE", os.path.join(os.path.expanduser("~"), ".cache", "mmreg_jax")
)


def enable_persistent_cache(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or _DEFAULT_DIR
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax versions: cache is best-effort
