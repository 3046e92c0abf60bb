"""Hugging Face Hub packaging/upload (parity with /root/reference/hf_uploading.py).

The reference's helper re-saves a training checkpoint's ``model_state_dict``
as ``pytorch_model.pth`` then crashes on a nonexistent ``torch.rename``
(hf_uploading.py:17 — SURVEY.md defect ledger). This rebuild:

- ``package_for_hub``: writes ``pytorch_model.pth`` (reference-compatible
  state_dict layout via export/torch_convert.py), our native ``params.npz``,
  the ONNX graph, and a minimal model card — a complete, working repo dir;
- ``upload_to_hub``: pushes it with huggingface_hub when a token is
  available (gated: this environment has no egress).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

from fast_neural_style_transfer_tpu.export.onnx_export import export_onnx
from fast_neural_style_transfer_tpu.export.torch_convert import to_torch_state_dict

_CARD = """---
library_name: fast_neural_style_transfer_tpu
tags: [style-transfer, jax, tpu]
---

# Fast Neural Style Transfer (TPU-trained)

Johnson et al. 2016 feed-forward stylizer with instance normalization,
trained with the TPU-native fast_neural_style_transfer_tpu framework.

Files:
- `pytorch_model.pth` — PyTorch state_dict (reference `StyleTransferNet` layout)
- `params.npz` — native JAX parameter pytree
- `model.onnx` — opset-11 ONNX graph (`input_image` -> `output_image`)
"""


def package_for_hub(params: Any, out_dir: str, *, metadata: Optional[dict] = None) -> str:
    from fast_neural_style_transfer_tpu.models.transformer import (
        require_single_style,
    )

    require_single_style(params, "package_for_hub")

    os.makedirs(out_dir, exist_ok=True)
    # 1. reference-compatible torch weights
    have_pth = True
    try:
        import torch

        sd = {
            k: torch.from_numpy(v.copy())
            for k, v in to_torch_state_dict(params).items()
        }
        torch.save(sd, os.path.join(out_dir, "pytorch_model.pth"))
    except ImportError:
        # torch-free host: npz + onnx still written — but say so, and do
        # not advertise the missing file in the model card
        have_pth = False
        print(
            "package_for_hub: torch not importable — pytorch_model.pth "
            "omitted from the package",
            flush=True,
        )
    # 2. native params
    from fast_neural_style_transfer_tpu.train.checkpoint import save_params_npz

    save_params_npz(params, os.path.join(out_dir, "params.npz"))
    # 3. ONNX
    export_onnx(params, os.path.join(out_dir, "model.onnx"))
    # 4. card + metadata — the card lists only files actually written
    card = _CARD
    if not have_pth:
        card = "\n".join(
            l for l in card.splitlines() if "pytorch_model.pth" not in l
        ) + "\n"
    with open(os.path.join(out_dir, "README.md"), "w") as fh:
        fh.write(card)
    if metadata:
        with open(os.path.join(out_dir, "config.json"), "w") as fh:
            json.dump(metadata, fh, indent=2)
    return out_dir


_ADAIN_CARD = """---
library_name: fast_neural_style_transfer_tpu
tags: [style-transfer, adain, arbitrary-style, jax, tpu]
---

# AdaIN Arbitrary-Style Transfer Decoder (TPU-trained)

Huang & Belongie 2017 AdaIN decoder (canonical architecture), trained with
the TPU-native fast_neural_style_transfer_tpu framework. Stylizes with ANY
style image at inference; pair it with standard torchvision VGG19 encoder
weights.

Files:
- `decoder.pth` — PyTorch state_dict (loads into the public implementations'
  decoder Sequential)
- `decoder.npz` — native JAX parameter pytree
- `adain_pipeline.onnx` — full two-input pipeline (VGG walk + AdaIN +
  decoder) as one opset-11 graph
"""


def package_adain_for_hub(
    decoder_params: Any,
    vgg_params: Any,
    out_dir: str,
    *,
    metadata: Optional[dict] = None,
) -> str:
    """AdaIN counterpart of ``package_for_hub``: decoder in torch + native
    formats plus the full-pipeline ONNX graph and a model card."""
    os.makedirs(out_dir, exist_ok=True)
    have_pth = True
    try:
        from fast_neural_style_transfer_tpu.export.torch_adain import (
            save_torch_adain_decoder,
        )

        save_torch_adain_decoder(
            decoder_params, os.path.join(out_dir, "decoder.pth"))
    except ImportError:
        have_pth = False
        print(
            "package_adain_for_hub: torch not importable — decoder.pth "
            "omitted from the package",
            flush=True,
        )
    from fast_neural_style_transfer_tpu.export.onnx_adain import export_adain_onnx
    from fast_neural_style_transfer_tpu.train.checkpoint import save_params_npz

    save_params_npz(decoder_params, os.path.join(out_dir, "decoder.npz"))
    export_adain_onnx(
        decoder_params, vgg_params, os.path.join(out_dir, "adain_pipeline.onnx"),
        content_shape=(1, 3, "height", "width"),
        style_shape=(1, 3, "style_h", "style_w"),
    )
    card = _ADAIN_CARD
    if not have_pth:
        card = "\n".join(
            l for l in card.splitlines()
            if "decoder.pth" not in l and "decoder Sequential" not in l
        ) + "\n"
    with open(os.path.join(out_dir, "README.md"), "w") as fh:
        fh.write(card)
    if metadata:
        with open(os.path.join(out_dir, "config.json"), "w") as fh:
            json.dump(metadata, fh, indent=2)
    return out_dir


def upload_to_hub(local_dir: str, repo_id: str, *, token: Optional[str] = None) -> str:
    """Push a packaged dir to the Hub. Requires network + token."""
    from huggingface_hub import HfApi

    api = HfApi(token=token)
    api.create_repo(repo_id, exist_ok=True)
    api.upload_folder(folder_path=local_dir, repo_id=repo_id)
    return f"https://huggingface.co/{repo_id}"
