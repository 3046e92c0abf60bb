from fast_neural_style_transfer_tpu.losses.perceptual import (
    LossTaps,
    content_loss,
    style_loss,
    style_targets_from_features,
    total_variation_loss,
)

__all__ = [
    "LossTaps",
    "content_loss",
    "style_loss",
    "style_targets_from_features",
    "total_variation_loss",
]
