"""Device-mesh setup (the TPU-native replacement for
``vxm.tf.utils.setup_device`` + ``tf.distribute.MirroredStrategy``,
`train_synthmorph.py:192,284-285`).

Parallelism layout (SURVEY §2.3):
  * ``data`` axis — batch (data-parallel) dimension; gradient all-reduce rides
    ICI automatically once batches are sharded over it,
  * ``space`` axis — optional spatial sharding of the volume X-axis for
    volumes larger than one chip's HBM (the TPU analogue of the reference's
    subvolume tiling, `bids_registration.py:169-219`).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def setup_devices(device_spec: str | None = None):
    """Parity with ``setup_device(gpu)``: a config string like ``"0"`` or
    ``"0,1"`` selects device indices; ``""``/``None``/``"-1"`` means all."""
    devs = jax.devices()
    if device_spec not in (None, "", "-1", -1):
        idx = [int(s) for s in str(device_spec).split(",")]
        devs = [devs[i] for i in idx if i < len(devs)]
    return devs, len(devs)


def make_mesh(n_devices: int | None = None, space: int = 1, devices=None) -> Mesh:
    """Create a ``(data, space)`` mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    if space > 1:
        if n_devices % space:
            raise ValueError(f"{n_devices} devices not divisible by space={space}")
        grid = devices.reshape(n_devices // space, space)
    else:
        grid = devices.reshape(n_devices, 1)
    return Mesh(grid, ("data", "space"))


def batch_sharding(mesh: Mesh, spatial_axis: bool = False) -> NamedSharding:
    """Sharding for (B, X, Y, Z, ...) batches: batch over 'data', optionally
    X over 'space'."""
    if spatial_axis:
        return NamedSharding(mesh, P("data", "space"))
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
