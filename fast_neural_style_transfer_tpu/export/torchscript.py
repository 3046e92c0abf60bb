"""TorchScript export (parity with /root/reference/model_scripting/).

The reference traces its nn.Module with ``torch.jit.trace(net,
rand(1,3,256,256), strict=False)`` into ``model_traced.pt``, which its
``inference.py:38`` loads for the ``.pt`` path. This module produces the same
artifact from OUR parameters: the stylizer forward is expressed as a pure
torch function over tensors converted from the pytree (OIHW/IOHW via
export/torch_convert.py) and traced. The traced graph is loadable by
``torch.jit.load`` anywhere, including the reference's inference path.

Eval-mode semantics (no dropout), NCHW like all torch interchange.
"""

from __future__ import annotations

from typing import Any, Dict


def _torch_forward_factory(sd: Dict[str, Any]):
    """Build fn(x: NCHW f32) -> NCHW f32 closing over converted weights."""
    import torch
    import torch.nn.functional as F

    def conv(x, prefix: str, stride: int = 1):
        w = sd[prefix + ".weight"]
        k = w.shape[-1]
        x = F.pad(x, [k // 2] * 4, mode="reflect")
        return F.conv2d(x, w, sd[prefix + ".bias"], stride=stride)

    def upconv(x, prefix: str):
        return F.conv_transpose2d(
            x, sd[prefix + ".weight"], sd[prefix + ".bias"],
            stride=2, padding=1, output_padding=1,
        )

    def inorm(x, prefix: str):
        return F.instance_norm(
            x, weight=sd[prefix + ".weight"], bias=sd[prefix + ".bias"], eps=1e-5
        )

    def forward(x):
        h = F.relu(inorm(conv(x, "conv1.conv", 2), "norm1"))
        h = F.relu(inorm(conv(h, "conv2.conv", 2), "norm2"))
        for i in range(5):
            y = F.relu(inorm(conv(h, f"res_blocks.{i}.conv1.conv"),
                             f"res_blocks.{i}.in1"))
            y = inorm(conv(y, f"res_blocks.{i}.conv2.conv"), f"res_blocks.{i}.in2")
            h = h + y
        h = F.relu(inorm(upconv(h, "up1.upsample_conv"), "norm3"))
        h = F.relu(inorm(upconv(h, "up2.upsample_conv"), "norm4"))
        return conv(h, "final_conv.conv")

    return forward


def export_torchscript(params: Any, path: str, *, example_hw: int = 256) -> str:
    """Trace the stylizer to a ``.pt`` (reference model_traced.pt equivalent)."""
    from fast_neural_style_transfer_tpu.models.transformer import (
        require_single_style,
    )

    require_single_style(params, "export_torchscript")

    import torch

    from fast_neural_style_transfer_tpu.export.torch_convert import to_torch_state_dict

    sd = {k: torch.from_numpy(v.copy()) for k, v in to_torch_state_dict(params).items()}
    forward = _torch_forward_factory(sd)
    example = torch.rand(1, 3, example_hw, example_hw)
    with torch.no_grad():
        traced = torch.jit.trace(forward, example, strict=False)
    traced.save(path)
    return path
