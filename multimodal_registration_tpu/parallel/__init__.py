from multimodal_registration_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated,
    setup_devices,
)

__all__ = ["batch_sharding", "make_mesh", "replicated", "setup_devices"]
