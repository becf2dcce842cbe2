"""Core device ops: warping, SVF integration, field algebra, resizing."""

from multimodal_registration_tpu.ops.field import (
    compose_fields,
    compose_fields_batch,
    compose_many,
)
from multimodal_registration_tpu.ops.grid import identity_grid
from multimodal_registration_tpu.ops.integrate import integrate_svf
from multimodal_registration_tpu.ops.resize import rescale_field, resize
from multimodal_registration_tpu.ops.warp import (
    sample,
    warp,
    warp_batch,
    warp_labels_soft_hard,
    warp_onehot,
)

__all__ = [
    "compose_fields",
    "compose_fields_batch",
    "compose_many",
    "identity_grid",
    "integrate_svf",
    "rescale_field",
    "resize",
    "sample",
    "warp",
    "warp_batch",
    "warp_labels_soft_hard",
    "warp_onehot",
]
