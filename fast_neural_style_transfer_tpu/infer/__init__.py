from fast_neural_style_transfer_tpu.infer.stylize import (
    Stylizer,
    stylize_directory,
    stylize_image_file,
)
from fast_neural_style_transfer_tpu.infer.spatial import (
    make_spatial_forward,
    stylize_spatial,
)
from fast_neural_style_transfer_tpu.infer.spatial_adain import (
    make_spatial_adain_forward,
    stylize_arbitrary_spatial,
)
from fast_neural_style_transfer_tpu.infer.adain import (
    ArbitraryStylizer,
    stylize_directory_arbitrary,
)

__all__ = [
    "Stylizer",
    "stylize_directory",
    "stylize_image_file",
    "make_spatial_forward",
    "stylize_spatial",
    "make_spatial_adain_forward",
    "stylize_arbitrary_spatial",
    "ArbitraryStylizer",
    "stylize_directory_arbitrary",
]
