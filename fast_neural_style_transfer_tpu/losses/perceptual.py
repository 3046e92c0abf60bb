"""Perceptual losses with the reference's exact reduction semantics.

The reference's idiosyncratic normalizations are preserved bit-for-bit in f32
so its published weight schedule (content 1000 halved / style 1 doubled every
10k iters, TV 10 — /root/reference/config.py:11-15, train.py:121-122,237-239)
produces the same training dynamics:

- style   (losses/losses.py:15-44): per layer, sum-reduction MSE between the
  batch Grams and the (broadcast) style-image Gram, scaled by
  ``layer_weight / c^2`` where c = channel count. The reference zips 4 tap
  indices with 3 weights, silently dropping the 4th (defect #2); here tap
  names and weights are length-validated, with defaults reproducing the
  effective behavior (3 layers).
- content (losses/losses.py:46-60): sum-reduction MSE at one tap, normalized
  by c*h*w (NOT by batch).
- TV      (losses/losses.py:62-73): anisotropic squared-difference total
  variation, summed, normalized by b*c*h*w.

Tap addressing is by VGG19 layer name (fixes defects #2/#3); the mapping from
the reference's positional indices [0,1,2] / 4 over its 5-tap feature list is
encoded in the defaults below.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import jax.numpy as jnp

from fast_neural_style_transfer_tpu.ops.gram import gram_matrix


@dataclasses.dataclass(frozen=True)
class LossTaps:
    """Which VGG19 activations feed each loss, validated at construction.

    Default style taps reproduce the reference's *effective* behavior:
    feature indices [0,1,2] (index 4 dropped by zip truncation) ->
    relu1_2, relu2_2, relu3_3 with weights .25/.3/.45.

    Default ``content_tap`` is ``relu4_2`` — the reference's *documented
    intent* (config.py:18), a deliberate divergence from its actual code,
    which taps feature index 4 = relu4_3 (losses/losses.py:49,
    vgg19_net.py:63). For exact reference-code behavior use
    ``REFERENCE_TAPS`` (or ``--reference_taps`` / ``--content_tap relu4_3``
    on the training CLI).
    """

    style_taps: Tuple[str, ...] = ("relu1_2", "relu2_2", "relu3_3")
    style_weights: Tuple[float, ...] = (0.25, 0.3, 0.45)
    content_tap: str = "relu4_2"

    def __post_init__(self):
        if len(self.style_taps) != len(self.style_weights):
            raise ValueError(
                f"{len(self.style_taps)} style taps but "
                f"{len(self.style_weights)} weights (the reference silently "
                "zip-truncated this mismatch; we refuse it)"
            )

    @property
    def all_taps(self) -> Tuple[str, ...]:
        """Deduplicated tap list in a stable order: style taps then content."""
        seen = list(self.style_taps)
        if self.content_tap not in seen:
            seen.append(self.content_tap)
        return tuple(seen)

    def split(self, feats: Sequence[jnp.ndarray]):
        """Split a feature list (ordered as ``all_taps``) into style/content."""
        by_name = dict(zip(self.all_taps, feats))
        return [by_name[t] for t in self.style_taps], by_name[self.content_tap]


# Reference-default taps: content index 4 == relu4_3 in its actual slice map.
REFERENCE_TAPS = LossTaps(content_tap="relu4_3")


def style_targets_from_features(style_feats: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
    """Precompute per-layer style Grams from a batch-1 style image's features.

    Mirrors get_style_targets (train.py:25-37): gram then squeeze(0) -> (c, c).
    """
    targets = []
    for f in style_feats:
        g = gram_matrix(f)
        targets.append(jnp.squeeze(g, axis=0))
    return targets


def style_loss(
    style_feats: Sequence[jnp.ndarray],
    target_grams: Sequence[jnp.ndarray],
    weights: Sequence[float],
    style_select: jnp.ndarray = None,
    batch_mask: jnp.ndarray = None,
) -> jnp.ndarray:
    """Sum over layers of ``w * sum((G - G_target)^2) / c^2``.

    Single-style (the reference semantics): each target is one (c, c) Gram,
    broadcast over the batch. Multi-style (conditional-IN training): each
    target is an (S, c, c) bank and ``style_select`` is a (B, S) row-per-
    example weight matrix (one-hot for sampled styles); the per-example
    target is the matching selection/blend of bank rows — the same tiny
    matmul that selects the IN affines in the model, so the loss each
    example sees is exactly the style its normalization was conditioned on.

    ``batch_mask`` ((B,) 0/1 floats): zeroes padding examples out of the
    batch sum — the loss is a plain sum over examples, so masking is EXACT
    (``--pad_batch``: train hostile batch shapes like the reference's b20
    padded to a TPU-friendly multiple of 8 with unchanged gradients).
    """
    if not (len(style_feats) == len(target_grams) == len(weights)):
        raise ValueError("style taps / targets / weights length mismatch")
    multi = target_grams[0].ndim == 3
    if multi and style_select is None:
        raise ValueError("(S, c, c) style-target banks need style_select")
    if style_select is not None and not multi:
        # the symmetric mistake — conditioned generator, single-gram
        # targets — would silently train every style toward one target
        raise ValueError(
            "style_select given but target_grams are single-style (c, c); "
            "stack per-style targets into (S, c, c) banks"
        )
    total = jnp.asarray(0.0, jnp.float32)
    for feat, tgt, w in zip(style_feats, target_grams, weights):
        g = gram_matrix(feat).astype(jnp.float32)  # (b, c, c)
        c = tgt.shape[-1]
        tgt = tgt.astype(jnp.float32)
        if multi:  # (b, s) @ (s, c, c) -> per-example (b, c, c) target
            tgt = jnp.einsum(
                "bs,sij->bij", style_select.astype(jnp.float32), tgt
            )
        else:
            tgt = tgt[None]  # broadcast one style over the batch
        sq = jnp.square(g - tgt)
        if batch_mask is not None:
            sq = sq * batch_mask.astype(jnp.float32)[:, None, None]
        layer = jnp.sum(sq)
        total = total + (w * layer) / (c * c)
    return total


def content_loss(
    input_feat: jnp.ndarray,
    target_feat: jnp.ndarray,
    batch_mask: jnp.ndarray = None,
) -> jnp.ndarray:
    """Sum-reduction MSE normalized by c*h*w (NHWC input).

    The normalizer is batch-independent (reference losses/losses.py:58), so
    masking padding examples (``batch_mask``) out of the sum is exact."""
    diff = input_feat.astype(jnp.float32) - target_feat.astype(jnp.float32)
    b, h, w, c = input_feat.shape
    sq = jnp.square(diff)
    if batch_mask is not None:
        sq = sq * batch_mask.astype(jnp.float32)[:, None, None, None]
    return jnp.sum(sq) / (c * h * w)


def total_variation_loss(
    img: jnp.ndarray, batch_mask: jnp.ndarray = None
) -> jnp.ndarray:
    """Anisotropic TV, summed then normalized by b*c*h*w (NHWC input).

    The normalizer divides by the BATCH COUNT (reference losses/losses.py:
    71), so with ``batch_mask`` both the sum and the count use only real
    examples — exact b-real semantics on a padded batch.

    (An NCHW-planar variant — lane-filling W instead of the 3-channel lane
    pad — measured a wash in the full b20 step, 88.80 vs 88.85 ms: XLA
    re-lays the tensor around the transpose and the diff fusions' cost
    just moves. Kept in NHWC, the simpler form.)"""
    x = img.astype(jnp.float32)
    b, h, w, c = x.shape
    sq_h = jnp.square(x[:, 1:, :, :] - x[:, :-1, :, :])
    sq_w = jnp.square(x[:, :, 1:, :] - x[:, :, :-1, :])
    if batch_mask is not None:
        m = batch_mask.astype(jnp.float32)
        sq_h = sq_h * m[:, None, None, None]
        sq_w = sq_w * m[:, None, None, None]
        denom = jnp.sum(m) * (c * h * w)
    else:
        denom = jnp.asarray(float(b * c * h * w), jnp.float32)
    return (jnp.sum(sq_h) + jnp.sum(sq_w)) / denom
