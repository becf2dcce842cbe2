"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding/pjit paths are exercised without TPU hardware.

Note: this environment preloads jax at interpreter startup, so JAX_PLATFORMS
set here would be too late — we use jax.config.update instead, which takes
effect because no backend has been initialized yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
