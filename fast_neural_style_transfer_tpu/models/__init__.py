from fast_neural_style_transfer_tpu.models.transformer import (
    TransformerNet,
    bake_style,
    num_styles,
)
from fast_neural_style_transfer_tpu.models.vgg import VGG19Features, VGG19_TAPS
from fast_neural_style_transfer_tpu.models.adain import (
    AdaINDecoder,
    adain,
    blended_style_stats,
    stylize_arbitrary,
)

__all__ = ["TransformerNet", "VGG19Features", "VGG19_TAPS", "bake_style",
           "num_styles", "AdaINDecoder", "adain", "stylize_arbitrary",
           "blended_style_stats"]
