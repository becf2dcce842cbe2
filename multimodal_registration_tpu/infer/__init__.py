from multimodal_registration_tpu.infer.config import InferenceConfig
from multimodal_registration_tpu.infer.preprocess import preprocess
from multimodal_registration_tpu.infer.register import Registrar, register
from multimodal_registration_tpu.infer.cascade import register_two_steps
from multimodal_registration_tpu.infer.sharded import ShardedRegistrar, make_registrar

__all__ = [
    "InferenceConfig", "Registrar", "ShardedRegistrar", "make_registrar",
    "preprocess", "register", "register_two_steps",
]
