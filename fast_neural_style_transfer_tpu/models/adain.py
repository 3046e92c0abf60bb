"""AdaIN arbitrary-style transfer (Huang & Belongie 2017, arXiv:1703.06868).

A second model family beyond the reference (which trains one feed-forward
net per style, /root/reference/train.py): ONE trained decoder stylizes with
ANY style image at inference, no retraining. Mechanism: encode content and
style through frozen VGG19 to relu4_1, re-normalize the content feature's
per-channel statistics to the style feature's (adaptive instance norm),
decode back to pixels. Style "strength" is a free inference knob
(``alpha`` interpolates the AdaIN target with the content feature).

TPU-shaped like the rest of the framework: pure-functional params pytrees,
NHWC, stats in f32, the whole stylize/train step one jitted XLA program.
The decoder mirrors VGG19 down from relu4_1 with reflect-padded 3x3 convs
(``ops.reflect_conv2d`` — same lowering tiers as the stylizer) and
nearest-neighbor x2 upsampling (checkerboard-free, and XLA lowers the
repeat to a cheap broadcast-reshape).

Reuses the frozen ``VGG19Features`` encoder (models/vgg.py) — taps
relu1_1/relu2_1/relu3_1/relu4_1 are the AdaIN paper's loss layers.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from fast_neural_style_transfer_tpu.core.dtypes import Precision
from fast_neural_style_transfer_tpu.models.transformer import _init_conv
from fast_neural_style_transfer_tpu.models.vgg import VGG19Features
from fast_neural_style_transfer_tpu.ops import reflect_conv2d

Params = Dict[str, Any]

ENCODE_TAP = "relu4_1"
STYLE_TAPS: Tuple[str, ...] = ("relu1_1", "relu2_1", "relu3_1", "relu4_1")

# Decoder program: mirror of VGG19 conv1_1..relu4_1. Entries are
# (out_channels, upsample_before). All 3x3 reflect convs + ReLU except the
# final 64->3, which is linear (pixels come back in network space).
_DECODER_CFG: Tuple[Tuple[int, bool], ...] = (
    (256, False),          # 512 -> 256
    (256, True), (256, False), (256, False), (128, False),  # x2 up, 256 stage
    (128, True), (64, False),                               # x2 up, 128 stage
    (64, True), (3, False),                                 # x2 up, to RGB
)


def resolve_style_weights(styles, style_weights):
    """(styles list, validated convex weights) from the public API's
    one-image-or-list ``style`` argument — shared by the single-device,
    H-sharded, and serving paths."""
    styles = list(styles) if isinstance(styles, (list, tuple)) else [styles]
    if style_weights is None:
        return styles, [1.0 / len(styles)] * len(styles)
    weights = [float(w) for w in style_weights]
    if len(weights) != len(styles):
        raise ValueError(
            f"{len(weights)} style_weights for {len(styles)} style images"
        )
    if any(w < 0 for w in weights) or abs(sum(weights) - 1.0) > 1e-3:
        raise ValueError(
            f"style interpolation weights must be convex (>= 0, sum to "
            f"1); got {weights} with sum {sum(weights):.4f}"
        )
    return styles, weights


def channel_stats(x: jnp.ndarray, eps: float = 1e-5):
    """Per-(batch, channel) mean and std over H, W — f32, biased variance
    (matches instance-norm statistics, ops/norm.py). Returns (B,1,1,C)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
    return mean, jnp.sqrt(var + eps)


def blended_style_stats(
    vgg_params: Any,
    style,
    style_weights=None,
    *,
    precision: Precision = Precision.f32(),
):
    """The interpolation-folded style moments: one (mu, sigma) pair such
    that ``sigma * c_norm + mu`` equals the convex combination of the
    per-style AdaIN targets (sum_s w_s (sigma_s c_norm + mu_s) ==
    (sum_s w_s sigma_s) c_norm + sum_s w_s mu_s). Serving paths cache this
    pair instead of re-encoding styles per content batch."""
    styles, weights = resolve_style_weights(style, style_weights)
    mu_s = sigma_s = 0.0
    for s_img, w in zip(styles, weights):
        (s_feat,) = VGG19Features.apply(vgg_params, s_img, (ENCODE_TAP,),
                                        precision=precision)
        mu, sigma = channel_stats(s_feat)
        mu_s = mu_s + w * mu
        sigma_s = sigma_s + w * sigma
    return mu_s, sigma_s


def adain(content_feat: jnp.ndarray, style_feat: jnp.ndarray) -> jnp.ndarray:
    """Adaptive instance norm: re-normalize content channel statistics to the
    style's — ``sigma_s * (x - mu_c) / sigma_c + mu_s`` (paper eq. 8)."""
    mu_c, sigma_c = channel_stats(content_feat)
    mu_s, sigma_s = channel_stats(style_feat)
    out = sigma_s * (content_feat.astype(jnp.float32) - mu_c) / sigma_c + mu_s
    return out.astype(content_feat.dtype)


class AdaINDecoder:
    """Pure-functional decoder: relu4_1 feature map (B, H/8, W/8, 512) ->
    network-space image (B, H, W, 3)."""

    @staticmethod
    def init(key: jax.Array) -> Params:
        keys = jax.random.split(key, len(_DECODER_CFG))
        params: Params = {"convs": []}
        cin = 512
        for k, (cout, _) in zip(keys, _DECODER_CFG):
            params["convs"].append(_init_conv(k, 3, cin, cout))
            cin = cout
        return params

    @staticmethod
    def apply(
        params: Params,
        feat: jnp.ndarray,
        *,
        precision: Precision = Precision.f32(),
    ) -> jnp.ndarray:
        x = feat.astype(precision.compute_dtype)
        last = len(_DECODER_CFG) - 1
        for i, (p, (_, up)) in enumerate(zip(params["convs"], _DECODER_CFG)):
            if up:  # nearest x2: broadcast-reshape under XLA, no FLOPs
                x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            w = p["w"].astype(precision.compute_dtype)
            b = p["b"].astype(jnp.float32)
            x = reflect_conv2d(x, w, b, stride=1,
                               accum_dtype=precision.accum_dtype)
            if i != last:
                x = jax.nn.relu(x)
            x = x.astype(precision.compute_dtype)
        return x


def feature_masks(style_masks: jnp.ndarray, hw: Tuple[int, int],
                  num_styles: int) -> jnp.ndarray:
    """Validate + downsample per-pixel style masks to the relu4_1 grid.

    ``style_masks``: (S, H, W) non-negative per-pixel style weights at
    image resolution. Average-pooled 8x down (the encoder's three pools)
    and normalized to sum to 1 per feature pixel; pixels where every mask
    is ~0 fall back to a uniform blend. Returns (S, H/8, W/8)."""
    m = jnp.asarray(style_masks, jnp.float32)
    if m.ndim != 3 or m.shape[0] != num_styles:
        raise ValueError(
            f"style_masks must be (S={num_styles}, H, W); got {m.shape}")
    if m.shape[1:] != tuple(hw):
        raise ValueError(
            f"style_masks spatial shape {m.shape[1:]} must equal the "
            f"content's {tuple(hw)}")
    s, h, w = m.shape
    mf = m.reshape(s, h // 8, 8, w // 8, 8).mean(axis=(2, 4))
    total = jnp.sum(mf, axis=0, keepdims=True)
    uniform = jnp.full_like(mf, 1.0 / s)
    return jnp.where(total > 1e-6, mf / jnp.maximum(total, 1e-6), uniform)


def stylize_arbitrary(
    decoder_params: Params,
    vgg_params: Any,
    content: jnp.ndarray,
    style,
    *,
    alpha: float = 1.0,
    style_weights=None,
    style_masks=None,
    precision: Precision = Precision.f32(),
) -> jnp.ndarray:
    """One arbitrary-style forward: encode both, AdaIN, blend, decode.

    ``style``: one NHWC style image, or a list of them — a list
    interpolates styles (paper eq. 15): each style's AdaIN target is
    computed and convex-combined with ``style_weights`` (default: equal).
    Style images may differ in size from the content and each other —
    only their channel statistics are used.

    ``style_masks``: (S, H, W) per-PIXEL style weights (paper §7.3 spatial
    control) — each region of the content is re-normalized toward its own
    style's statistics, masks average-pooled to the feature grid and
    normalized per pixel. Mutually exclusive with ``style_weights`` (masks
    ARE the per-pixel weights).

    ``alpha`` in [0, 1]: 1.0 = full stylization, 0.0 = reconstruct the
    content (paper §7.1 runtime control). Content H, W must be multiples
    of 8 (three VGG pools down, three x2 ups back).
    """
    if style_masks is not None and style_weights is not None:
        raise ValueError(
            "style_masks and style_weights are mutually exclusive: masks "
            "are per-pixel weights already")
    styles, weights = resolve_style_weights(style, style_weights)
    masks_f = None
    if style_masks is not None:
        masks_f = feature_masks(style_masks, content.shape[1:3], len(styles))

    (c_feat,) = VGG19Features.apply(vgg_params, content, (ENCODE_TAP,),
                                    precision=precision)
    # Normalize the content feature ONCE — each style only rescales it
    # (sigma_s * c_norm + mu_s). The per-style loop must not recompute the
    # full-feature-map content statistics: this path runs un-jitted from the
    # CLI, so XLA CSE never gets a chance to dedupe the reduction.
    mu_c, sigma_c = channel_stats(c_feat)
    c_norm = (c_feat.astype(jnp.float32) - mu_c) / sigma_c
    t = jnp.zeros_like(c_norm)
    for i, (s_img, w) in enumerate(zip(styles, weights)):
        (s_feat,) = VGG19Features.apply(vgg_params, s_img, (ENCODE_TAP,),
                                        precision=precision)
        mu_s, sigma_s = channel_stats(s_feat)
        wi = w if masks_f is None else masks_f[i][None, :, :, None]
        t = t + wi * (sigma_s * c_norm + mu_s)
    t = alpha * t + (1.0 - alpha) * c_feat.astype(jnp.float32)
    return AdaINDecoder.apply(decoder_params, t.astype(c_feat.dtype),
                              precision=precision)
