from fast_neural_style_transfer_tpu.ops.conv import (
    reflect_conv2d,
    conv2d_same,
    conv_transpose2d,
    max_pool2d,
)
from fast_neural_style_transfer_tpu.ops.norm import (
    apply_instance_norm_stats,
    instance_norm,
    instance_norm_stats,
)
from fast_neural_style_transfer_tpu.ops.gram import gram_matrix

__all__ = [
    "reflect_conv2d",
    "conv2d_same",
    "conv_transpose2d",
    "max_pool2d",
    "instance_norm",
    "instance_norm_stats",
    "apply_instance_norm_stats",
    "gram_matrix",
]
