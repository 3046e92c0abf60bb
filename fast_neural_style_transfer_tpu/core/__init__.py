from fast_neural_style_transfer_tpu.core.dtypes import (
    Precision,
    canonical_compute_dtype,
)
from fast_neural_style_transfer_tpu.core.shapes import (
    round_up_to_multiple,
    pad_to_multiple_reflect,
    bucket_hw,
)

__all__ = [
    "Precision",
    "canonical_compute_dtype",
    "round_up_to_multiple",
    "pad_to_multiple_reflect",
    "bucket_hw",
]
