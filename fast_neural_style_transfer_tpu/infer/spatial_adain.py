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
from fast_neural_style_transfer_tpu.models.adain import (
    ENCODE_TAP,
    _DECODER_CFG,
    blended_style_stats,
)
from fast_neural_style_transfer_tpu.models.spatial import vgg_features_sharded
from fast_neural_style_transfer_tpu.parallel.mesh import MeshPlan, shard_map_checked
from fast_neural_style_transfer_tpu.ops import sharded as sh

AXIS = "space"

# (mesh, precision) -> jitted forward; same trace-cache rationale as
# infer/spatial.py's _FWD_CACHE (a fresh shard_map closure per call would
# defeat jit's cache and recompile on every image).
_FWD_CACHE: dict = {}


def channel_stats_sharded(x: jnp.ndarray, *, eps: float = 1e-5,
                          axis: str = AXIS):
    """Global per-(b, c) mean/std of an H-sharded map — the exact sharded
    mirror of ``models.adain.channel_stats`` (f32, biased variance)."""
    xf = x.astype(jnp.float32)
    count = x.shape[1] * x.shape[2] * lax.axis_size(axis)
    mean = lax.psum(jnp.sum(xf, axis=(1, 2), keepdims=True), axis) / count
    xc = xf - mean
    var = lax.psum(jnp.sum(xc * xc, axis=(1, 2), keepdims=True), axis) / count
    return mean, jnp.sqrt(var + eps)


def adain_decoder_forward_sharded(
    params: Any,
    feat: jnp.ndarray,
    *,
    precision: Precision = Precision.f32(),
    axis: str = AXIS,
) -> jnp.ndarray:
    """H-sharded mirror of ``AdaINDecoder.apply``: reflect convs exchange
    their 1-row halos; nearest-x2 upsampling is a purely local row repeat
    (each output row depends on exactly one input row, so shard boundaries
    map cleanly)."""
    x = feat.astype(precision.compute_dtype)
    last = len(_DECODER_CFG) - 1
    for i, (p, (_, up)) in enumerate(zip(params["convs"], _DECODER_CFG)):
        if up:
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
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
    alpha) -> image``; content NHWC with H divisible by 8 * n_shards and at
    least 16 rows per shard (VGG's three pools leave >= 2 feature rows, the
    reflect-halo minimum); (mu_s, sigma_s) are (B_or_1, 1, 1, 512) style
    moments; alpha a scalar (traced — no recompile per strength)."""
    if AXIS not in plan.mesh.axis_names:
        raise ValueError(
            "mesh has no 'space' axis; build with make_mesh_plan(spatial=N)")
    key = (plan.mesh, precision)
    cached = _FWD_CACHE.get(key)
    if cached is not None:
        return cached

    def fwd(dec_params, vgg_params, content, mu_s, sigma_s, alpha):
        (c_feat,) = vgg_features_sharded(
            vgg_params, content, (ENCODE_TAP,), precision=precision, axis=AXIS)
        mu_c, sigma_c = channel_stats_sharded(c_feat, axis=AXIS)
        cf = c_feat.astype(jnp.float32)
        t = sigma_s * (cf - mu_c) / sigma_c + mu_s
        t = alpha * t + (1.0 - alpha) * cf
        return adain_decoder_forward_sharded(
            dec_params, t.astype(c_feat.dtype), precision=precision, axis=AXIS)

    mapped = shard_map_checked(
        fwd,
        plan.mesh,
        in_specs=(P(), P(), P(None, AXIS, None, None), P(), P(), P()),
        out_specs=P(None, AXIS, None, None),
        check=False,
    )
    jitted = jax.jit(mapped)
    _FWD_CACHE[key] = jitted
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
    precision: Precision = Precision.f32(),
) -> jnp.ndarray:
    """``models.adain.stylize_arbitrary`` with content H sharded over chips.

    Pads content H (reflect; edge for tiny images) up to a multiple of
    8 * n_shards and at least 16 rows per shard, W to a multiple of 8, and
    crops the output back. Style image(s) are encoded unsharded; a list
    interpolates styles exactly as the single-chip path does.

    Exactness caveat: output is bit-comparable to the single-device path
    only when H already satisfies the shard constraint. Otherwise this path
    pads MORE rows than the single-device route (multiple of 8*n_shards vs
    of 8), and because the AdaIN moments are global, the extra reflected
    rows shift mu_c/sigma_c slightly — same class of pad influence as the
    single-device route's own 8-multiple pad, just a larger extent. Shard
    counts should stay small relative to H/16 for large images (the
    intended use), where the effect vanishes.
    """
    n_shards = plan.mesh.shape[AXIS]
    # style moments, unsharded (styles are small relative to the content)
    mu_s, sigma_s = blended_style_stats(vgg_params, style, style_weights,
                                        precision=precision)

    mult = 8 * n_shards
    n, h, w_, c = content.shape
    target_h = max(-(-h // mult) * mult, 16 * n_shards)
    ph = target_h - h
    pw = -w_ % 8
    x = content
    if ph or pw:
        mode = "reflect" if (ph < h and pw < w_) else "edge"
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode=mode)
    fwd = make_spatial_adain_forward(plan, precision=precision)
    out = fwd(decoder_params, vgg_params, x, mu_s, sigma_s,
              jnp.asarray(alpha, jnp.float32))
    if ph or pw:
        # crop host-side: slicing a sharded dim to a non-divisible extent is
        # not expressible as a sharded op
        return jnp.asarray(jax.device_get(out)[:, :h, :w_, :])
    return out
