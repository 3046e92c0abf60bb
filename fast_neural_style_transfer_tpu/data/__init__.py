from fast_neural_style_transfer_tpu.data.dataset import ImageFolderDataset
from fast_neural_style_transfer_tpu.data.pipeline import InputPipeline

__all__ = ["ImageFolderDataset", "InputPipeline"]
