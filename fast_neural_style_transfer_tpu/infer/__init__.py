from fast_neural_style_transfer_tpu.infer.stylize import Stylizer, stylize_image_file

__all__ = ["Stylizer", "stylize_image_file"]
