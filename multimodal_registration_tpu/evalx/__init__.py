from multimodal_registration_tpu.evalx.jacobian import folding_summary, jacobian_determinant
from multimodal_registration_tpu.evalx.nmi import (
    detect_zero_padding,
    normalized_mutual_information,
)
from multimodal_registration_tpu.evalx.overlap import overlap_metrics

__all__ = [
    "detect_zero_padding",
    "folding_summary",
    "jacobian_determinant",
    "normalized_mutual_information",
    "overlap_metrics",
]
