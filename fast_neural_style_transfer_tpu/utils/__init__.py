from fast_neural_style_transfer_tpu.utils.image_io import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    denormalize_image,
    load_image,
    normalize_image,
    save_image,
)
from fast_neural_style_transfer_tpu.utils.logging import MetricLogger

__all__ = [
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "load_image",
    "save_image",
    "normalize_image",
    "denormalize_image",
    "MetricLogger",
]
