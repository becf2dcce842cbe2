from multimodal_registration_tpu.models.unet import Unet
from multimodal_registration_tpu.models.vxm_dense import (
    VxmConfig,
    VxmDense,
    apply_model,
    build_model,
    init_params,
)

__all__ = ["Unet", "VxmConfig", "VxmDense", "apply_model", "build_model", "init_params"]
