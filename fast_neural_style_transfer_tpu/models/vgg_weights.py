"""VGG19 pretrained-weight loading/conversion.

The reference downloads torchvision's ImageNet VGG19 at construction time
(/root/reference/models/vgg19_net.py:26-27). This environment has no network
egress, so pretrained weights must be supplied as a file; this module accepts:

- ``.npz``: our native format — arrays named ``<conv_name>.w`` (HWIO) and
  ``<conv_name>.b``, e.g. ``conv1_1.w``.
- ``.pth`` / ``.pt``: a torchvision ``vgg19().state_dict()`` or
  ``vgg19().features.state_dict()`` (keys ``features.0.weight`` / ``0.weight``,
  OIHW), converted on load. Requires torch importable (CPU is fine).

``resolve_params`` is the single entry point: given an optional path it loads
and converts, else falls back to the deterministic random init with a loud
warning (stylization quality needs real ImageNet features; random features
still exercise every code path and keep losses finite).
"""

from __future__ import annotations

import os
import warnings
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fast_neural_style_transfer_tpu.models.vgg import (
    CONV_NAMES,
    TORCHVISION_CONV_INDEX,
    VGG19Features,
)

Params = Dict[str, Any]


def save_npz(params: Params, path: str) -> None:
    flat = {}
    for name in CONV_NAMES:
        flat[f"{name}.w"] = np.asarray(params[name]["w"])
        flat[f"{name}.b"] = np.asarray(params[name]["b"])
    np.savez(path, **flat)


def load_npz(path: str) -> Params:
    data = np.load(path)
    params: Params = {}
    for name in CONV_NAMES:
        params[name] = {
            "w": jnp.asarray(data[f"{name}.w"], jnp.float32),
            "b": jnp.asarray(data[f"{name}.b"], jnp.float32),
        }
    return params


def from_torch_state_dict(state_dict: Dict[str, Any]) -> Params:
    """Convert a torchvision VGG19 state_dict (OIHW) to our HWIO pytree."""

    def get(idx: int, kind: str) -> np.ndarray:
        for prefix in (f"features.{idx}.", f"{idx}."):
            key = prefix + kind
            if key in state_dict:
                v = state_dict[key]
                a = (v.detach().cpu().numpy() if hasattr(v, "detach")
                     else np.asarray(v))
                # own the data: tensor.numpy() is a view of torch storage,
                # and jnp.asarray is zero-copy for contiguous arrays on CPU
                # (see export/torch_convert._to_np)
                return np.array(a, copy=True)
        raise KeyError(f"VGG19 state_dict missing layer {idx} {kind}")

    params: Params = {}
    for name in CONV_NAMES:
        idx = TORCHVISION_CONV_INDEX[name]
        w = get(idx, "weight")  # (out, in, kh, kw)
        b = get(idx, "bias")
        params[name] = {
            "w": jnp.asarray(np.transpose(w, (2, 3, 1, 0)), jnp.float32),  # -> HWIO
            "b": jnp.asarray(b, jnp.float32),
        }
    return params


def to_torch_state_dict(params: Params) -> Dict[str, np.ndarray]:
    """Inverse of ``from_torch_state_dict``: our HWIO pytree -> a
    torchvision-``features``-layout state dict (``features.{idx}.weight``
    OIHW / ``.bias``). Lets torch-side harnesses (the lockstep
    training-dynamics parity oracle, tests/test_lockstep_parity.py) run the
    reference's executable VGG slicing with THIS repo's weights — the only
    way to compare training dynamics when no pretrained file exists."""
    sd: Dict[str, np.ndarray] = {}
    for name in CONV_NAMES:
        idx = TORCHVISION_CONV_INDEX[name]
        w = np.asarray(params[name]["w"], np.float32)  # HWIO
        sd[f"features.{idx}.weight"] = np.transpose(w, (3, 2, 0, 1)).copy()
        sd[f"features.{idx}.bias"] = np.asarray(params[name]["b"], np.float32).copy()
    return sd


def load_torch_file(path: str) -> Params:
    import torch  # CPU torch is available in this image

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return from_torch_state_dict(obj)


def resolve_params(path: Optional[str], *, seed: int = 0) -> Params:
    """Load VGG19 weights from ``path``; fall back to deterministic init."""
    if path:
        if not os.path.exists(path):
            raise FileNotFoundError(f"VGG19 weights file not found: {path}")
        if path.endswith(".npz"):
            return load_npz(path)
        if path.endswith((".pth", ".pt", ".bin")):
            return load_torch_file(path)
        raise ValueError(f"unsupported VGG19 weights format: {path}")
    env_path = os.environ.get("FNST_VGG19_WEIGHTS")
    if env_path and os.path.exists(env_path):
        return resolve_params(env_path)
    warnings.warn(
        "No pretrained VGG19 weights supplied (pass --vgg_weights or set "
        "FNST_VGG19_WEIGHTS). Falling back to deterministic random features: "
        "training will run but stylization quality requires ImageNet weights.",
        stacklevel=2,
    )
    return VGG19Features.init(jax.random.PRNGKey(seed))
