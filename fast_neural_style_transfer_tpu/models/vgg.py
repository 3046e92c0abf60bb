"""Frozen VGG19 feature extractor for perceptual losses, name-addressed taps.

The reference wraps torchvision's pretrained vgg19().features and slices it
into 5 sequential chunks (/root/reference/models/vgg19_net.py:21-65). Its
construction crashes (slice5 never created — SURVEY.md defect #1) and its slice
boundaries don't match their comments (defect #3): the actual taps, verified
against torchvision's vgg19 layer table, are

    slice1 = features[0:4)   -> relu1_2
    slice2 = features[4:9)   -> relu2_2
    slice3 = features[9:16)  -> relu3_3
    slice4 = features[16:22) -> conv4_2 (PRE-activation, despite 'relu4_2' comment)
    slice5 = features[22:25) -> relu4_3

This rebuild is name-addressed: you ask for taps by layer name and get exactly
those activations, with ``DEFAULT_TAPS`` reproducing the reference's *actual*
5-tap behavior. Computation runs each conv once and forks at tap points (the
reference's chunked Sequential does the same work).

Pretrained ImageNet weights cannot be downloaded in this environment; load them
from a file via ``models/vgg_weights.py`` (torchvision .pth state_dict or .npz)
or use the deterministic ``init`` for tests. Expected input: ImageNet-normalized
NHWC (the reference normalizes with mean .485/.456/.406, std .229/.224/.225 —
train.py:92-102).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from fast_neural_style_transfer_tpu.core.dtypes import Precision
from fast_neural_style_transfer_tpu.ops import conv2d_same, max_pool2d

Params = Dict[str, Any]

# Full VGG19 feature-extractor program up to relu4_4/pool4 is not needed; we
# materialize through relu5_4 anyway so any tap name is addressable.
# Entries: (name, kind) where kind is 'conv' (3x3 SAME conv, channels given),
# 'relu', or 'pool' (2x2/2 max).
_CFG: List[Tuple[str, int]] = [
    ("conv1_1", 64), ("conv1_2", 64),
    ("pool1", 0),
    ("conv2_1", 128), ("conv2_2", 128),
    ("pool2", 0),
    ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256), ("conv3_4", 256),
    ("pool3", 0),
    ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512), ("conv4_4", 512),
    ("pool4", 0),
    ("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512), ("conv5_4", 512),
]

# The reference's actual 5 taps, in forward order (see module docstring).
VGG19_TAPS: Tuple[str, ...] = ("relu1_2", "relu2_2", "relu3_3", "conv4_2", "relu4_3")
DEFAULT_TAPS = VGG19_TAPS

CONV_NAMES: Tuple[str, ...] = tuple(n for n, c in _CFG if c)

# torchvision vgg19.features index of each conv, for .pth key conversion
TORCHVISION_CONV_INDEX: Dict[str, int] = {
    "conv1_1": 0, "conv1_2": 2,
    "conv2_1": 5, "conv2_2": 7,
    "conv3_1": 10, "conv3_2": 12, "conv3_3": 14, "conv3_4": 16,
    "conv4_1": 19, "conv4_2": 21, "conv4_3": 23, "conv4_4": 25,
    "conv5_1": 28, "conv5_2": 30, "conv5_3": 32, "conv5_4": 34,
}


def _addressable_names() -> Tuple[str, ...]:
    names = []
    for name, c in _CFG:
        if c:
            names.append(name)
            names.append("relu" + name[4:])
        else:
            names.append(name)
    return tuple(names)


ADDRESSABLE = _addressable_names()


class VGG19Features:
    """Pure-functional VGG19 with name-addressed activation taps."""

    @staticmethod
    def init(key: jax.Array, *, scale: float = 0.05) -> Params:
        """Deterministic random init (tests / no-pretrained-weights fallback)."""
        params: Params = {}
        cin = 3
        for name, cout in _CFG:
            if not cout:
                continue
            key, wk, bk = jax.random.split(key, 3)
            params[name] = {
                "w": scale * jax.random.normal(wk, (3, 3, cin, cout), jnp.float32),
                "b": jnp.zeros((cout,), jnp.float32),
            }
            cin = cout
        return params

    @staticmethod
    def apply(
        params: Params,
        x: jnp.ndarray,
        taps: Sequence[str] = DEFAULT_TAPS,
        *,
        precision: Precision = Precision.f32(),
    ) -> List[jnp.ndarray]:
        """Run until the deepest requested tap; return activations in tap order.

        Gradients flow through (the reference backprops the perceptual loss
        through frozen VGG into the stylizer — train.py:180,201); freezing means
        the caller never differentiates w.r.t. ``params``.
        """
        return tap_walk(
            params,
            x,
            taps,
            conv_fn=lambda p, h: conv2d_same(
                h, p["w"], p["b"], accum_dtype=precision.accum_dtype
            ),
            pool_fn=max_pool2d,
            compute_dtype=precision.compute_dtype,
        )


def tap_walk(
    params: Params,
    x: jnp.ndarray,
    taps: Sequence[str],
    *,
    conv_fn,
    pool_fn,
    compute_dtype,
) -> List[jnp.ndarray]:
    """The single VGG19 tap-walk, parameterized by its primitives.

    Both the plain forward (``VGG19Features.apply``) and the H-sharded one
    (``models/spatial.py::vgg_features_sharded``) are this walk with
    different ``conv_fn(p, h)`` / ``pool_fn(h)``; keeping one copy means the
    tap-addressing semantics (name-addressed, pre-/post-ReLU, early exit at
    the deepest tap) cannot drift between them.
    """
    for t in taps:
        if t not in ADDRESSABLE:
            raise ValueError(f"unknown VGG19 tap {t!r}; valid: {ADDRESSABLE}")
    wanted = set(taps)
    deepest = max(ADDRESSABLE.index(t) for t in taps)

    acts: Dict[str, jnp.ndarray] = {}
    h = x.astype(compute_dtype)
    pos = -1
    for name, cout in _CFG:
        if pos >= deepest:
            break
        if cout:
            h = conv_fn(params[name], h).astype(compute_dtype)
            pos += 1
            if name in wanted:
                acts[name] = h
            if pos >= deepest:
                break
            rname = "relu" + name[4:]
            h = jax.nn.relu(h)
            pos += 1
            if rname in wanted:
                acts[rname] = h
        else:
            h = pool_fn(h)
            pos += 1
            if name in wanted:
                acts[name] = h
    return [acts[t] for t in taps]
