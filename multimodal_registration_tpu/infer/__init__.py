from multimodal_registration_tpu.infer.config import InferenceConfig
from multimodal_registration_tpu.infer.preprocess import preprocess
from multimodal_registration_tpu.infer.register import Registrar, register
from multimodal_registration_tpu.infer.cascade import register_two_steps

__all__ = ["InferenceConfig", "Registrar", "preprocess", "register", "register_two_steps"]
