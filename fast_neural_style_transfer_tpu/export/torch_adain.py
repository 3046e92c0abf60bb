"""AdaIN decoder interchange with the PyTorch ecosystem.

The AdaIN family has no reference counterpart (/root/reference trains one
net per style), but the paper's decoder architecture is a de-facto standard
in public PyTorch implementations (Huang & Belongie's own release and its
ports): a Sequential of ReflectionPad2d(1) + Conv2d(3x3) + ReLU with
nearest-x2 Upsample at the stage boundaries — exactly ``_DECODER_CFG``
(models/adain.py). This module maps those state_dicts onto our params and
back, so public pretrained AdaIN decoders drop into ``fnst-adain stylize``
and TPU-trained decoders load into torch Sequentials.

Import is ORDER-based, not key-based: a Sequential's conv keys are
numbering-scheme-specific (``decoder.1.weight`` vs ``1.weight`` vs module
wrappers), but the convs always appear in forward order, each a 4-D OIHW
weight followed by its 1-D bias. Shapes are validated against
``_DECODER_CFG`` so a mismatched architecture fails loudly, never silently.

Only the DECODER interchanges here. The VGG encoder side must still be the
standard torchvision VGG19 (``--vgg_weights``); public AdaIN repos often
ship a re-scaled "normalised" VGG whose feature magnitudes differ — a
decoder trained against one expects the matching encoder.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from fast_neural_style_transfer_tpu.models.adain import _DECODER_CFG, ENCODE_TAP

Params = Dict[str, Any]


def _load_params_into(dec, params: Params) -> None:
    """Load our decoder params into a ``build_torch_decoder()`` module
    in-place (HWIO -> OIHW; strict, so every shape is validated)."""
    import torch

    sd = dec.state_dict()
    it = iter(params["convs"])
    for key in list(sd.keys()):
        if key.endswith(".weight"):
            conv = next(it)
            sd[key] = torch.from_numpy(
                np.transpose(np.asarray(conv["w"], np.float32), (3, 2, 0, 1)))
            sd[key[:-len(".weight")] + ".bias"] = torch.from_numpy(
                np.asarray(conv["b"], np.float32))
    dec.load_state_dict(sd)


def _to_np(v) -> np.ndarray:
    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)


def adain_decoder_from_state_dict(state_dict: Dict[str, Any]) -> Params:
    """Torch AdaIN-decoder state_dict -> our params pytree (order-based)."""
    convs = []
    pending_w = None
    for key, val in state_dict.items():
        arr = _to_np(val)
        if arr.ndim == 4:
            if pending_w is not None:
                raise ValueError(
                    f"two consecutive conv weights without a bias between "
                    f"them (at {key!r}); not a plain conv Sequential")
            pending_w = arr
        elif arr.ndim == 1 and pending_w is not None:
            if arr.shape[0] != pending_w.shape[0]:
                raise ValueError(
                    f"bias {key!r} of length {arr.shape[0]} does not match "
                    f"preceding conv with {pending_w.shape[0]} out-channels")
            convs.append((pending_w, arr))
            pending_w = None
        # anything else (norm stats, buffers) is not part of this decoder
    if pending_w is not None:
        raise ValueError("trailing conv weight without a bias")

    expected = []
    cin = 512
    for cout, _ in _DECODER_CFG:
        expected.append((cout, cin, 3, 3))
        cin = cout
    got = [w.shape for w, _ in convs]
    if got != expected:
        raise ValueError(
            f"decoder architecture mismatch: state_dict convs {got} vs the "
            f"canonical AdaIN decoder {expected}")

    return {
        "convs": [
            {"w": np.transpose(w, (2, 3, 1, 0)).astype(np.float32),  # OIHW->HWIO
             "b": b.astype(np.float32)}
            for w, b in convs
        ]
    }


def load_torch_adain_decoder(path: str) -> Params:
    """Load a torch ``.pth``/``.pt`` AdaIN decoder (bare state_dict or one
    wrapped under a common key)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    for wrapper in ("decoder", "model_state_dict", "state_dict"):
        if isinstance(obj, dict) and wrapper in obj and isinstance(
                obj[wrapper], dict):
            obj = obj[wrapper]
    return adain_decoder_from_state_dict(obj)


def build_torch_decoder():
    """The canonical decoder as a torch Sequential (pad/conv/relu with
    nearest-x2 Upsample where ``_DECODER_CFG`` upsamples) — the same module
    layout public AdaIN implementations use, generated from the config so it
    can never drift from our JAX decoder."""
    import torch.nn as nn

    layers = []
    cin = 512
    last = len(_DECODER_CFG) - 1
    for i, (cout, up) in enumerate(_DECODER_CFG):
        if up:
            layers.append(nn.Upsample(scale_factor=2, mode="nearest"))
        layers.append(nn.ReflectionPad2d(1))
        layers.append(nn.Conv2d(cin, cout, 3))
        if i != last:
            layers.append(nn.ReLU())
        cin = cout
    return nn.Sequential(*layers)


def export_adain_torchscript(
    decoder_params: Params,
    vgg_params: Any,
    path: str,
    *,
    alpha: float = 1.0,
    example_hw: int = 64,
) -> str:
    """Trace the FULL arbitrary-style pipeline (VGG19 walk to relu4_1 on
    both inputs, AdaIN, decoder) to a two-input TorchScript ``.pt`` —
    the torch-runtime counterpart of the two-input ONNX export
    (export/onnx_adain.py). NCHW, ImageNet-normalized inputs; alpha is
    baked at export like the ONNX path. Resolution-agnostic: the traced
    graph contains only shape-polymorphic ops (conv/pool/interpolate/
    mean), so any H, W divisible by 8 runs."""
    import torch
    import torch.nn.functional as F

    from fast_neural_style_transfer_tpu.models.vgg import _CFG as VGG_CFG

    vgg_sd = {}
    for name, cout in VGG_CFG:
        if not cout:
            continue
        p = vgg_params[name]
        vgg_sd[name] = (
            torch.from_numpy(np.transpose(
                np.asarray(p["w"], np.float32), (3, 2, 0, 1))),
            torch.from_numpy(np.asarray(p["b"], np.float32)),
        )
        if "relu" + name[4:] == ENCODE_TAP:
            break
    dec = build_torch_decoder()
    _load_params_into(dec, decoder_params)
    dec.eval()
    for p in dec.parameters():  # traced as constants, not graph inputs
        p.requires_grad_(False)
    a = float(alpha)

    def encode(x):
        h = x
        for name, cout in VGG_CFG:
            if cout:
                w, b = vgg_sd[name]
                h = F.relu(F.conv2d(h, w, b, padding=1))
                if "relu" + name[4:] == ENCODE_TAP:
                    return h
            else:
                h = F.max_pool2d(h, 2, 2)
        return h

    def stats(f):
        mu = f.mean(dim=(2, 3), keepdim=True)
        var = ((f - mu) ** 2).mean(dim=(2, 3), keepdim=True)
        return mu, torch.sqrt(var + 1e-5)

    def forward(content, style):
        cf = encode(content)
        sf = encode(style)
        mu_c, sd_c = stats(cf)
        mu_s, sd_s = stats(sf)
        t = sd_s * (cf - mu_c) / sd_c + mu_s
        t = a * t + (1.0 - a) * cf
        return dec(t)

    example = (torch.randn(1, 3, example_hw, example_hw),
               torch.randn(1, 3, example_hw, example_hw))
    with torch.no_grad():
        traced = torch.jit.trace(forward, example)
    traced.save(path)
    return path


def save_torch_adain_decoder(params: Params, path: str) -> str:
    """Our decoder params -> a torch state_dict .pth that loads strict into
    ``build_torch_decoder()`` (and, by layout, the public implementations)."""
    import torch

    dec = build_torch_decoder()
    _load_params_into(dec, params)  # strict: validates every shape
    torch.save(dec.state_dict(), path)
    return path
