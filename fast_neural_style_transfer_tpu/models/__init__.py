from fast_neural_style_transfer_tpu.models.transformer import (
    TransformerNet,
    bake_style,
    num_styles,
)
from fast_neural_style_transfer_tpu.models.vgg import VGG19Features, VGG19_TAPS

__all__ = ["TransformerNet", "VGG19Features", "VGG19_TAPS", "bake_style",
           "num_styles"]
