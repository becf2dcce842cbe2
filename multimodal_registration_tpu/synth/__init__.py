from multimodal_registration_tpu.synth.augment import (
    maybe_zero_borders,
    random_flips,
    random_zero_borders,
)
from multimodal_registration_tpu.synth.image_engine import ImageEngineConfig, labels_to_image
from multimodal_registration_tpu.synth.labelmaps import generate_label_map, generate_label_maps
from multimodal_registration_tpu.synth.perlin import draw_perlin

__all__ = [
    "ImageEngineConfig",
    "draw_perlin",
    "generate_label_map",
    "generate_label_maps",
    "labels_to_image",
    "maybe_zero_borders",
    "random_flips",
    "random_zero_borders",
]
