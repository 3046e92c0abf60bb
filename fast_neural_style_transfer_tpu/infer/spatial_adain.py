"""Spatially-sharded AdaIN inference: arbitrary-style 4K+ across chips.

The AdaIN family's counterpart of ``infer/spatial.py``: content image height
sharded over the mesh 'space' axis, VGG encode + decoder convs exchanging
halos over ICI, and the AdaIN statistics — per-(batch, channel) moments over
the WHOLE feature map — computed exactly via ``lax.psum`` (the same two-pass
global-stat pattern as ``ops.sharded.instance_norm_sharded``). Overlap-tiling
would be mathematically wrong here for the same reason it is for instance
norm: the re-normalization couples every pixel to the global moments.

The style image(s) only contribute channel statistics, so they are encoded
UNSHARDED (styles are small) and enter the sharded program as a replicated
(mu, sigma) pair. Style interpolation (models/adain.py, paper eq. 15)
collapses into that same pair: sum_s w_s (sigma_s c_norm + mu_s)
== (sum_s w_s sigma_s) c_norm + (sum_s w_s mu_s).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from fast_neural_style_transfer_tpu.core.dtypes import Precision
from fast_neural_style_transfer_tpu.core.shapes import pad_to_multiple_reflect
from fast_neural_style_transfer_tpu.models.adain import (
    ENCODE_TAP,
    _DECODER_CFG,
    blended_style_stats,
    channel_stats,
    feature_masks,
    resolve_style_weights,
)
from fast_neural_style_transfer_tpu.models.vgg import VGG19Features
from fast_neural_style_transfer_tpu.models.spatial import vgg_features_sharded
from fast_neural_style_transfer_tpu.parallel.mesh import MeshPlan, shard_map_checked
from fast_neural_style_transfer_tpu.ops import sharded as sh

AXIS = "space"

# (mesh, precision) -> jitted forward; same trace-cache rationale as
# infer/spatial.py's _FWD_CACHE (a fresh shard_map closure per call would
# defeat jit's cache and recompile on every image).
_FWD_CACHE: dict = {}


def channel_stats_sharded(x: jnp.ndarray, *, eps: float = 1e-5,
                          axis: str = AXIS, extent=None):
    """Global per-(b, c) mean/std of an H-sharded map — the exact sharded
    mirror of ``models.adain.channel_stats`` (f32, biased variance).

    ``extent`` (traced scalar OK): global active H; rows >= extent are
    excluded from both moments (they must already be zero — the masked VGG
    walk guarantees it — so only the centered pass needs the mask and the
    count shrinks to extent * W)."""
    xf = x.astype(jnp.float32)
    if extent is None:
        count = x.shape[1] * x.shape[2] * lax.axis_size(axis)
        mean = lax.psum(jnp.sum(xf, axis=(1, 2), keepdims=True), axis) / count
        xc = xf - mean
        var = lax.psum(jnp.sum(xc * xc, axis=(1, 2), keepdims=True),
                       axis) / count
        return mean, jnp.sqrt(var + eps)
    keep = (sh.global_row_index(x.shape[1], axis) < extent)
    keep = keep[None, :, None, None].astype(jnp.float32)
    count = extent.astype(jnp.float32) * x.shape[2]
    mean = lax.psum(jnp.sum(xf, axis=(1, 2), keepdims=True), axis) / count
    xc = (xf - mean) * keep
    var = lax.psum(jnp.sum(xc * xc, axis=(1, 2), keepdims=True), axis) / count
    return mean, jnp.sqrt(var + eps)


def adain_decoder_forward_sharded(
    params: Any,
    feat: jnp.ndarray,
    *,
    precision: Precision = Precision.f32(),
    axis: str = AXIS,
    extent=None,
) -> jnp.ndarray:
    """H-sharded mirror of ``AdaINDecoder.apply``: reflect convs exchange
    their 1-row halos; nearest-x2 upsampling is a purely local row repeat
    (each output row depends on exactly one input row, so shard boundaries
    map cleanly).

    ``extent`` (traced scalar OK): global active H of ``feat``. When set,
    each conv first writes row ``extent-2`` into row ``extent`` — exactly
    the one virtual row the unsharded reflect pad would supply at an array
    that ENDS at ``extent`` — so rows < extent match the single-device
    decoder on the extent-tall input bit-for-bit. Rows beyond carry junk
    that influences nothing below the extent (a 3x3 conv reads one row past
    it, and that row is re-pinned before every conv); the caller crops them.
    When ``extent`` equals the global H the row write is a no-op and the
    global reflect edge in ``halo_extend`` takes over. Upsampling doubles
    the extent. Costs one (B, 1, W, C) psum per conv — noise next to the
    conv itself."""
    x = feat.astype(precision.compute_dtype)
    last = len(_DECODER_CFG) - 1
    for i, (p, (_, up)) in enumerate(zip(params["convs"], _DECODER_CFG)):
        if up:
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            if extent is not None:
                extent = extent * 2
        if extent is not None:
            edge = sh.fetch_global_row(x, extent - 2, axis=axis)
            x = sh.set_global_row(x, extent, edge, axis=axis)
        w = p["w"].astype(precision.compute_dtype)
        b = p["b"].astype(jnp.float32)
        x = sh.reflect_conv2d_sharded(x, w, b, stride=1, axis=axis)
        if i != last:
            x = jax.nn.relu(x)
        x = x.astype(precision.compute_dtype)
    return x


def make_spatial_adain_forward(plan: MeshPlan, *,
                               precision: Precision = Precision.f32()):
    """Jitted H-sharded AdaIN forward over ``plan``'s 'space' axis.

    Signature: ``fwd(decoder_params, vgg_params, content, mu_s, sigma_s,
    alpha, active_h) -> image``; content NHWC with H divisible by 8 *
    n_shards and at least 16 rows per shard (VGG's three pools leave >= 2
    feature rows, the reflect-halo minimum); (mu_s, sigma_s) are
    (B_or_1, 1, 1, 512) style moments; alpha a scalar and active_h an int32
    scalar (both traced — no recompile per strength or per true height).

    ``active_h``: the true (multiple-of-8, >= 16) image height; rows beyond
    it must be ZERO on input. The whole pipeline then computes rows <
    active_h exactly as the single-device path does on an active_h-tall
    image: the VGG walk re-zeroes dead rows after each conv, the AdaIN
    moments mask them out of the psums, and each decoder reflect conv pins
    the one virtual boundary row. Pass the full padded H for the aligned
    case — every mask degenerates to a no-op."""
    if AXIS not in plan.mesh.axis_names:
        raise ValueError(
            "mesh has no 'space' axis; build with make_mesh_plan(spatial=N)")
    key = (plan.mesh, precision)
    cached = _FWD_CACHE.get(key)
    if cached is not None:
        return cached

    def fwd(dec_params, vgg_params, content, mu_s, sigma_s, alpha, active_h):
        (c_feat,) = vgg_features_sharded(
            vgg_params, content, (ENCODE_TAP,), precision=precision,
            axis=AXIS, extent=active_h)
        e_f = active_h // 8  # three pools down to the relu4_1 scale
        mu_c, sigma_c = channel_stats_sharded(c_feat, axis=AXIS, extent=e_f)
        cf = c_feat.astype(jnp.float32)
        t = sigma_s * (cf - mu_c) / sigma_c + mu_s
        t = alpha * t + (1.0 - alpha) * cf
        return adain_decoder_forward_sharded(
            dec_params, t.astype(c_feat.dtype), precision=precision,
            axis=AXIS, extent=e_f)

    mapped = shard_map_checked(
        fwd,
        plan.mesh,
        in_specs=(P(), P(), P(None, AXIS, None, None), P(), P(), P(), P()),
        out_specs=P(None, AXIS, None, None),
        check=False,
    )
    jitted = jax.jit(mapped)
    _FWD_CACHE[key] = jitted
    return jitted


# (mesh, precision) -> jitted MASKED forward (paper §7.3 spatial style
# control on the sharded path). Separate cache from _FWD_CACHE: the masked
# program takes per-style stat STACKS and an H-sharded mask instead of one
# folded (mu, sigma) pair.
_FWD_MASKED_CACHE: dict = {}


def make_spatial_adain_masked_forward(
        plan: MeshPlan, *, precision: Precision = Precision.f32()):
    """Jitted H-sharded AdaIN forward with per-pixel style masks.

    Signature: ``fwd(dec, vgg, content, mu_stack, sigma_stack, masks_f,
    alpha, active_h)``; ``mu_stack``/``sigma_stack`` are (S, 1, 1, 512)
    per-style moments (replicated), ``masks_f`` the (S, H/8, W/8)
    per-feature-pixel weights H-SHARDED over 'space' like the content —
    the per-pixel interpolation folds the same way the scalar one does:
    t = (sum_s m_s sigma_s) c_norm + sum_s m_s mu_s, computed per shard
    with zero extra communication."""
    if AXIS not in plan.mesh.axis_names:
        raise ValueError(
            "mesh has no 'space' axis; build with make_mesh_plan(spatial=N)")
    key = (plan.mesh, precision)
    cached = _FWD_MASKED_CACHE.get(key)
    if cached is not None:
        return cached

    def fwd(dec_params, vgg_params, content, mu_stack, sigma_stack,
            masks_f, alpha, active_h):
        (c_feat,) = vgg_features_sharded(
            vgg_params, content, (ENCODE_TAP,), precision=precision,
            axis=AXIS, extent=active_h)
        e_f = active_h // 8
        mu_c, sigma_c = channel_stats_sharded(c_feat, axis=AXIS, extent=e_f)
        cf = c_feat.astype(jnp.float32)
        c_norm = (cf - mu_c) / sigma_c
        s = mu_stack.shape[0]
        sig_eff = jnp.einsum("shw,sc->hwc", masks_f,
                             sigma_stack.reshape(s, -1))[None]
        mu_eff = jnp.einsum("shw,sc->hwc", masks_f,
                            mu_stack.reshape(s, -1))[None]
        t = sig_eff * c_norm + mu_eff
        t = alpha * t + (1.0 - alpha) * cf
        return adain_decoder_forward_sharded(
            dec_params, t.astype(c_feat.dtype), precision=precision,
            axis=AXIS, extent=e_f)

    mapped = shard_map_checked(
        fwd,
        plan.mesh,
        in_specs=(P(), P(), P(None, AXIS, None, None), P(), P(),
                  P(None, AXIS, None), P(), P()),
        out_specs=P(None, AXIS, None, None),
        check=False,
    )
    jitted = jax.jit(mapped)
    _FWD_MASKED_CACHE[key] = jitted
    return jitted


def stylize_arbitrary_spatial(
    decoder_params: Any,
    vgg_params: Any,
    content: jnp.ndarray,
    style,
    plan: MeshPlan,
    *,
    alpha: float = 1.0,
    style_weights=None,
    style_masks=None,
    precision: Precision = Precision.f32(),
) -> jnp.ndarray:
    """``models.adain.stylize_arbitrary`` with content H sharded over chips.

    Matches the single-device route (reflect-pad to a multiple of 8, run,
    crop back) to f32 tolerance at ANY size, shard-aligned or not. Two-stage
    padding makes that possible: stage 1 is the exact canonical pad the
    single-device path applies (``pad_to_multiple_reflect(x, 8)``, edge mode
    for tiny images, minimum 16 rows); stage 2 zero-fills from there up to
    the equal-slab height (multiple of 8 * n_shards, >= 16 rows per shard),
    and the forward masks those dead rows out of every conv, the AdaIN
    moments, and the decoder's reflect boundaries (see
    ``make_spatial_adain_forward``). Style image(s) are encoded unsharded; a
    list interpolates styles exactly as the single-chip path does.

    ``style_masks`` (S, H, W): per-pixel style weights (paper §7.3 spatial
    control), mutually exclusive with ``style_weights``. Pooled to the
    feature grid exactly like the single-device path, then H-sharded along
    with the content — the per-pixel interpolation folds per shard with no
    extra communication.
    """
    n_shards = plan.mesh.shape[AXIS]
    if style_masks is not None and style_weights is not None:
        raise ValueError(
            "style_masks and style_weights are mutually exclusive: masks "
            "are per-pixel weights already")
    if style_masks is None:
        # style moments, unsharded (styles are small relative to the content)
        mu_s, sigma_s = blended_style_stats(vgg_params, style, style_weights,
                                            precision=precision)
    else:
        styles, _ = resolve_style_weights(style, None)
        stats = []
        for s_img in styles:
            (s_feat,) = VGG19Features.apply(vgg_params, s_img, (ENCODE_TAP,),
                                            precision=precision)
            stats.append(channel_stats(s_feat))
        mu_s = jnp.concatenate([m for m, _ in stats], axis=0)     # (S,1,1,C)
        sigma_s = jnp.concatenate([sd for _, sd in stats], axis=0)

    n, h, w_, c = content.shape
    # stage 1: the single-device path's own canonical pad — byte-for-byte
    x, _ = pad_to_multiple_reflect(content, 8)
    if x.shape[1] < 16:
        # both routes need >= 2 relu4_1 feature rows for the decoder's
        # reflect pad; the single-device route cannot run below this either
        x = jnp.pad(x, ((0, 0), (0, 16 - x.shape[1]), (0, 0), (0, 0)),
                    mode="edge")
    h8 = x.shape[1]
    # stage 2: zero rows up to the equal-slab height; the forward's
    # active-extent masks keep them out of the math entirely
    mult = 8 * n_shards
    target_h = max(-(-h8 // mult) * mult, 16 * n_shards)
    if target_h > h8:
        x = jnp.pad(x, ((0, 0), (0, target_h - h8), (0, 0), (0, 0)))
    if style_masks is None:
        fwd = make_spatial_adain_forward(plan, precision=precision)
        out = fwd(decoder_params, vgg_params, x, mu_s, sigma_s,
                  jnp.asarray(alpha, jnp.float32), jnp.asarray(h8, jnp.int32))
    else:
        # the single-device pad recipe for masks, stage by stage: edge-pad
        # to the canonical (h8, w8) so mask pixels keep tracking content
        # pixels, pool to the feature grid, then zero-fill the dead slab
        # rows (they land past the active extent and never enter the math)
        m = jnp.asarray(style_masks, jnp.float32)
        if m.ndim != 3 or m.shape[1:] != (h, w_):
            raise ValueError(
                f"style_masks must be (S, {h}, {w_}); got {m.shape}")
        ph1, pw1 = h8 - h, x.shape[2] - w_
        if ph1 or pw1:
            m = jnp.pad(m, ((0, 0), (0, ph1), (0, pw1)), mode="edge")
        masks_f = feature_masks(m, (h8, x.shape[2]), m.shape[0])
        if target_h > h8:
            masks_f = jnp.pad(
                masks_f, ((0, 0), (0, (target_h - h8) // 8), (0, 0)))
        fwd = make_spatial_adain_masked_forward(plan, precision=precision)
        out = fwd(decoder_params, vgg_params, x, mu_s, sigma_s, masks_f,
                  jnp.asarray(alpha, jnp.float32), jnp.asarray(h8, jnp.int32))
    if (target_h, x.shape[2]) != (h, w_):
        # crop host-side: slicing a sharded dim to a non-divisible extent is
        # not expressible as a sharded op
        return jnp.asarray(jax.device_get(out)[:, :h, :w_, :])
    return out
