from fast_neural_style_transfer_tpu.export.torch_convert import (
    from_torch_state_dict,
    load_torch_checkpoint,
    save_torch_checkpoint,
    to_torch_state_dict,
)

from fast_neural_style_transfer_tpu.export.onnx_export import (
    build_onnx_model,
    export_onnx,
)

__all__ = [
    "from_torch_state_dict",
    "to_torch_state_dict",
    "load_torch_checkpoint",
    "save_torch_checkpoint",
    "build_onnx_model",
    "export_onnx",
]
