from multimodal_registration_tpu.train.config import TrainConfig
from multimodal_registration_tpu.train.trainer import Trainer

__all__ = ["TrainConfig", "Trainer"]
