"""Bidirectional stylizer-checkpoint interchange with the reference format.

The reference trains/serves PyTorch ``StyleTransferNet`` state_dicts, either
bare or wrapped in a checkpoint dict under ``model_state_dict``
(/root/reference/train.py:269-283, inference.py:32-36). This module maps that
layout onto our parameter pytree and back, so

- reference-trained ``.pth`` checkpoints run on this framework unchanged
  (the SSIM-parity path), and
- TPU-trained params export to a ``.pth`` the reference's ``inference.py``
  loads as a drop-in.

Layout mapping (reference module tree -> our pytree):
    conv1.conv.{weight,bias}            -> conv1.{w,b}       OIHW -> HWIO
    norm1.{weight,bias}                 -> norm1.{gamma,beta}
    conv2.conv / norm2                  -> conv2 / norm2
    res_blocks.{i}.conv1.conv           -> res_blocks[i].conv1
    res_blocks.{i}.in1                  -> res_blocks[i].in1  (same for conv2/in2)
    up1.upsample_conv.{weight,bias}     -> up1.{w,b}          IOHW -> HWIO
    up2.upsample_conv / norm3 / norm4   -> up2 / norm3 / norm4
    final_conv.conv                     -> final_conv

ConvTranspose2d stores weights (in, out, kh, kw); Conv2d stores
(out, in, kh, kw) — both become (kh, kw, in, out) HWIO here.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from fast_neural_style_transfer_tpu.models.transformer import NUM_RES_BLOCKS

Params = Dict[str, Any]

# (our conv name path, torch key prefix, is_transpose)
_CONV_MAP: List[Tuple[Tuple, str, bool]] = [
    (("conv1",), "conv1.conv", False),
    (("conv2",), "conv2.conv", False),
    (("up1",), "up1.upsample_conv", True),
    (("up2",), "up2.upsample_conv", True),
    (("final_conv",), "final_conv.conv", False),
] + [
    ((("res_blocks", i, c)), f"res_blocks.{i}.{c}.conv", False)
    for i in range(NUM_RES_BLOCKS)
    for c in ("conv1", "conv2")
]

_NORM_MAP: List[Tuple[Tuple, str]] = [
    (("norm1",), "norm1"),
    (("norm2",), "norm2"),
    (("norm3",), "norm3"),
    (("norm4",), "norm4"),
] + [
    ((("res_blocks", i, n)), f"res_blocks.{i}.{n}")
    for i in range(NUM_RES_BLOCKS)
    for n in ("in1", "in2")
]


def _get(params: Params, path) -> Dict[str, Any]:
    node: Any = params
    for k in path:
        node = node[k]
    return node


def _to_np(v) -> np.ndarray:
    """Tensor/array -> an OWNING numpy array (always copies).

    ``tensor.numpy()`` returns a VIEW of torch storage, and on the CPU
    backend ``jnp.asarray`` of a contiguous f32 numpy array is ZERO-COPY —
    without the copy, params converted from a live module alias torch
    storage and a later in-place ``optimizer.step()`` silently mutates the
    jax pytree (found by the lockstep harness: synced-mode losses reflected
    POST-step IN affines)."""
    a = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return np.array(a, copy=True)


def from_torch_state_dict(state_dict: Dict[str, Any]) -> Params:
    """Reference StyleTransferNet state_dict -> our parameter pytree."""
    params: Params = {"res_blocks": [{} for _ in range(NUM_RES_BLOCKS)]}
    for path, prefix, transpose in _CONV_MAP:
        w = _to_np(state_dict[prefix + ".weight"]).astype(np.float32)
        b = _to_np(state_dict[prefix + ".bias"]).astype(np.float32)
        # Conv2d OIHW -> HWIO; ConvTranspose2d IOHW -> HWIO
        perm = (2, 3, 0, 1) if transpose else (2, 3, 1, 0)
        node = {"w": jnp.asarray(np.transpose(w, perm)), "b": jnp.asarray(b)}
        _set(params, path, node)
    for path, prefix in _NORM_MAP:
        node = {
            "gamma": jnp.asarray(_to_np(state_dict[prefix + ".weight"]), jnp.float32),
            "beta": jnp.asarray(_to_np(state_dict[prefix + ".bias"]), jnp.float32),
        }
        _set(params, path, node)
    return params


# Torch key prefixes in the reference's MODULE REGISTRATION order
# (model.py:24-47: conv1, norm1, conv2, norm2, res_blocks.{i}.(conv1, in1,
# conv2, in2), up1, norm3, up2, norm4, final_conv). This order matters:
# torch Adam's integer state ids index ``model.parameters()``, which follows
# registration order, so a state_dict (and the optimizer ids derived from
# it) must be emitted in exactly this sequence for the reference trainer to
# pair each parameter with its own moments.
_TORCH_PREFIX_ORDER: List[str] = (
    ["conv1.conv", "norm1", "conv2.conv", "norm2"]
    + [
        f"res_blocks.{i}.{m}"
        for i in range(NUM_RES_BLOCKS)
        for m in ("conv1.conv", "in1", "conv2.conv", "in2")
    ]
    + ["up1.upsample_conv", "norm3", "up2.upsample_conv", "norm4",
       "final_conv.conv"]
)


def to_torch_state_dict(params: Params) -> Dict[str, np.ndarray]:
    """Our parameter pytree -> reference state_dict layout (NumPy values),
    keys in the reference's registration order (see _TORCH_PREFIX_ORDER)."""
    sd: Dict[str, np.ndarray] = {}
    for path, prefix, transpose in _CONV_MAP:
        node = _get(params, path)
        w = np.asarray(node["w"], np.float32)  # HWIO
        perm = (2, 3, 0, 1) if transpose else (3, 2, 0, 1)
        sd[prefix + ".weight"] = np.transpose(w, perm)
        sd[prefix + ".bias"] = np.asarray(node["b"], np.float32)
    for path, prefix in _NORM_MAP:
        node = _get(params, path)
        sd[prefix + ".weight"] = np.asarray(node["gamma"], np.float32)
        sd[prefix + ".bias"] = np.asarray(node["beta"], np.float32)
    ordered: Dict[str, np.ndarray] = {}
    for prefix in _TORCH_PREFIX_ORDER:
        for leaf in (".weight", ".bias"):
            ordered[prefix + leaf] = sd.pop(prefix + leaf)
    assert not sd, f"unmapped keys: {list(sd)}"
    return ordered


def _set(params: Params, path, node) -> None:
    parent: Any = params
    for k in path[:-1]:
        parent = parent[k]
    parent[path[-1]] = node


def _load_torch_file(path: str):
    """One ``torch.load`` per (path, mtime): the training start-up asks
    ``is_torch_training_checkpoint`` and then immediately loads the same
    multi-MB file for real — cache the deserialized object once, bounded."""
    mtime = os.path.getmtime(path)
    return _load_torch_cached(path, mtime)


@functools.lru_cache(maxsize=1)
def _load_torch_cached(path: str, _mtime: float):
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def load_torch_checkpoint(path: str) -> Params:
    """Load a reference ``.pth``/``.bin`` (bare state_dict or training
    checkpoint dict with ``model_state_dict`` — train.py:272-279)."""
    obj = _load_torch_file(path)
    if hasattr(obj, "state_dict"):  # the pickled-full-module .bin variant
        obj = obj.state_dict()
    if isinstance(obj, dict) and "model_state_dict" in obj:
        obj = obj["model_state_dict"]
    return from_torch_state_dict(obj)


def is_torch_training_checkpoint(path: str) -> bool:
    """True iff ``path`` is a torch-loadable reference TRAINING checkpoint
    (carries optimizer state — train.py:269-283), as opposed to a bare
    state_dict .pth, an .npz, or an Orbax directory."""
    if not (os.path.isfile(path) and path.endswith((".pth", ".pt", ".bin"))):
        return False
    try:
        obj = _load_torch_file(path)
    except Exception:
        return False
    return isinstance(obj, dict) and "optimizer_state_dict" in obj


def from_torch_training_checkpoint(path: str):
    """Full reference training checkpoint -> (params, adam_mu, adam_nu,
    adam_count, iteration).

    The reference saves ``model_state_dict`` + ``optimizer_state_dict`` +
    ``iteration`` every 5000 iters (/root/reference/train.py:269-283) and its
    resume path restores Adam moments and the schedule position
    (/root/reference/train.py:39-66). This extracts that state for optax:

    - torch Adam's integer state ids index ``param_groups[0]['params']``,
      which follows ``model.parameters()`` order — identical to the
      state_dict key order for this model (InstanceNorm2d here has
      ``track_running_stats=False``, so the state_dict holds parameters
      only). Each id therefore maps to the state_dict key at the same
      position, and the moments convert with the same OIHW/IOHW -> HWIO
      transposes as the weights they shadow.
    - ``adam_count`` is torch Adam's per-param ``step`` (drives bias
      correction; optax keeps one global count), falling back to
      ``iteration`` for params the optimizer never touched.
    """
    obj = _load_torch_file(path)
    if not (isinstance(obj, dict) and "optimizer_state_dict" in obj):
        raise ValueError(
            f"{path} is not a reference training checkpoint "
            "(no optimizer_state_dict)"
        )
    msd = obj["model_state_dict"]
    params = from_torch_state_dict(msd)
    iteration = int(obj.get("iteration", 0))

    osd = obj["optimizer_state_dict"]
    ids = list(osd["param_groups"][0]["params"])
    keys = list(msd.keys())
    if len(ids) != len(keys):
        raise ValueError(
            f"optimizer has {len(ids)} params but model has {len(keys)}"
        )
    mu_sd: Dict[str, Any] = {}
    nu_sd: Dict[str, Any] = {}
    adam_count = iteration
    for pos, pid in enumerate(ids):
        st = osd["state"].get(pid, osd["state"].get(str(pid)))
        key = keys[pos]
        if st is None:  # param never stepped (fresh optimizer)
            mu_sd[key] = np.zeros_like(_to_np(msd[key]))
            nu_sd[key] = np.zeros_like(_to_np(msd[key]))
        else:
            mu_sd[key] = st["exp_avg"]
            nu_sd[key] = st["exp_avg_sq"]
            if pos == 0:
                adam_count = int(_to_np(st["step"]))
    return params, from_torch_state_dict(mu_sd), from_torch_state_dict(nu_sd), adam_count, iteration


def save_torch_checkpoint(params: Params, path: str) -> None:
    """Write a ``.pth`` the reference's inference.py loads directly
    (wrapped in the checkpoint-dict layout it expects at inference.py:33-36)."""
    from fast_neural_style_transfer_tpu.models.transformer import (
        require_single_style,
    )

    require_single_style(params, "save_torch_checkpoint")

    import torch

    sd = {k: torch.from_numpy(v.copy()) for k, v in to_torch_state_dict(params).items()}
    torch.save({"model_state_dict": sd}, path)


def save_torch_training_checkpoint(
    params: Params,
    mu: Params,
    nu: Params,
    adam_count: int,
    iteration: int,
    path: str,
    *,
    lr: float = 1e-3,
    weight_decay: float = 1e-5,
    loss: float = 0.0,
    weights: Dict[str, float] = None,
) -> None:
    """Write a FULL reference-format training checkpoint — the dict layout
    /root/reference/train.py:269-283 saves and train.py:39-66 resumes from —
    so a TPU run can be continued by the reference's own trainer with its
    Adam moments and schedule position intact (inverse of
    ``from_torch_training_checkpoint``)."""
    import torch

    def _t(sd):
        return {k: torch.from_numpy(np.array(v, np.float32)) for k, v in sd.items()}

    msd = _t(to_torch_state_dict(params))
    mu_sd = _t(to_torch_state_dict(mu))
    nu_sd = _t(to_torch_state_dict(nu))
    opt_state = {
        i: {
            "step": torch.tensor(float(adam_count)),
            "exp_avg": mu_sd[k],
            "exp_avg_sq": nu_sd[k],
        }
        for i, k in enumerate(msd)
    }
    # torch Adam.load_state_dict installs the saved param_groups verbatim, so
    # every hyperparameter its step() reads must be present
    group = {
        "lr": lr,
        "betas": (0.9, 0.999),
        "eps": 1e-8,
        "weight_decay": weight_decay,
        "amsgrad": False,
        "maximize": False,
        "foreach": None,
        "capturable": False,
        "differentiable": False,
        "fused": None,
        "params": list(range(len(msd))),
    }
    w = weights or {}
    torch.save(
        {
            "model_state_dict": msd,
            "optimizer_state_dict": {"state": opt_state, "param_groups": [group]},
            "scheduler_state_dict": {"last_epoch": iteration, "_step_count": iteration + 1},
            "iteration": iteration,
            "loss": loss,
            "content_weight": w.get("content", 1000.0),
            "style_weight": w.get("style", 1.0),
            "tv_weight": w.get("tv", 10.0),
        },
        path,
    )
