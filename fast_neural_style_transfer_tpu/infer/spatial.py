"""Spatially-sharded stylizer forward: H sharded over the mesh 'space' axis.

Large-image (4K) inference can exceed one chip's HBM/VMEM comfort zone; the
TPU answer is to shard the image height over chips and exchange only the
convolution halos over ICI (SURVEY.md §5.7's "spatial analogue of long
context"). Plain GSPMD can't propagate reflect-pad on a sharded dim, so this
module implements the forward explicitly under ``shard_map``:

- every reflect-conv exchanges k//2 boundary rows with its mesh neighbors via
  ``lax.ppermute``; the first/last shard reflect their own true image edge,
  so the math is bit-identical to the unsharded forward (not an overlap-tile
  approximation);
- stride-2 transpose convs need exactly one halo row from the next shard
  (derived from PyTorch's output_padding=1 semantics; zero-padded at the
  global bottom edge, matching lax/torch zero padding);
- instance norm computes its per-(sample, channel) statistics with a
  two-pass ``lax.psum`` over the 'space' axis — true global spatial stats,
  which overlap-tiling could never give.

Requires local H divisible by 2 per stride-2 stage (global H divisible by
4 * n_space_shards); ``stylize_spatial`` pads/crops to satisfy that.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older JAX
    from jax.experimental.shard_map import shard_map

from fast_neural_style_transfer_tpu.parallel.mesh import MeshPlan

AXIS = "space"


def _axis_size():
    return lax.axis_size(AXIS)


def _my_index():
    return lax.axis_index(AXIS)


def _from_prev(rows: jnp.ndarray) -> jnp.ndarray:
    """Each shard receives ``rows`` from its previous (upper) neighbor."""
    n = _axis_size()
    return lax.ppermute(rows, AXIS, [(i, (i + 1) % n) for i in range(n)])


def _from_next(rows: jnp.ndarray) -> jnp.ndarray:
    n = _axis_size()
    return lax.ppermute(rows, AXIS, [(i, (i - 1) % n) for i in range(n)])


def _halo_extend_reflect(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """Extend the local H slab by p rows per side: neighbor rows inside the
    image, reflection of the shard's own rows at the true image edges."""
    if p == 0:
        return x
    top_halo = _from_prev(x[:, -p:])            # prev shard's bottom rows
    bot_halo = _from_next(x[:, :p])             # next shard's top rows
    top_reflect = x[:, 1 : p + 1][:, ::-1]      # rows p..1 (torch ReflectionPad)
    bot_reflect = x[:, -p - 1 : -1][:, ::-1]
    idx = _my_index()
    n = _axis_size()
    top = jnp.where(idx == 0, top_reflect, top_halo)
    bot = jnp.where(idx == n - 1, bot_reflect, bot_halo)
    return jnp.concatenate([top, x, bot], axis=1)


def _sharded_reflect_conv(x, p_conv, *, stride: int = 1):
    """ReflectConv with H halo-exchanged; W reflect-padded locally."""
    w = p_conv["w"]
    k = w.shape[0]
    pad = k // 2
    x = _halo_extend_reflect(x, pad)
    x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (0, 0)), mode="reflect")
    out = lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p_conv["b"].astype(out.dtype)


def _sharded_conv_transpose(x, p_conv):
    """Stride-2 k3 p1 op1 transpose conv (models/transformer.py decoder):
    halo = 1 row from the NEXT shard only; last shard zero-pads (lax/torch
    transpose-conv padding is zeros)."""
    w = p_conv["w"]  # (3, 3, in, out)
    halo = _from_next(x[:, :1])
    zero = jnp.zeros_like(halo)
    idx = _my_index()
    n = _axis_size()
    bot = jnp.where(idx == n - 1, zero, halo)
    ext = jnp.concatenate([x, bot], axis=1)  # h+1 rows
    wf = w[::-1, ::-1, :, :]
    # H: pad_lo=1, pad_hi=0 over the dilated (h+1)-row slab -> exactly 2h rows
    # W: the standard pad_lo=1, pad_hi=2 of k3 s2 p1 op1
    out = lax.conv_general_dilated(
        ext, wf.astype(ext.dtype), (1, 1),
        ((1, 0), (1, 2)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p_conv["b"].astype(out.dtype)


def _sharded_instance_norm(x, p_norm, *, relu: bool, eps: float = 1e-5):
    """IN with global spatial statistics via psum over the 'space' axis."""
    xf = x.astype(jnp.float32)
    local_hw = x.shape[1] * x.shape[2]
    count = local_hw * _axis_size()
    s = lax.psum(jnp.sum(xf, axis=(1, 2), keepdims=True), AXIS)
    mean = s / count
    xc = xf - mean
    var = lax.psum(jnp.sum(xc * xc, axis=(1, 2), keepdims=True), AXIS) / count
    out = xc * lax.rsqrt(var + eps)
    out = out * p_norm["gamma"].astype(jnp.float32) + p_norm["beta"].astype(jnp.float32)
    if relu:
        out = jnp.maximum(out, 0.0)
    return out.astype(x.dtype)


def _spatial_forward(params: Any, x: jnp.ndarray) -> jnp.ndarray:
    """Per-shard body run under shard_map; mirrors TransformerNet.apply
    (eval mode) with every H-crossing op sharding-aware."""
    h = _sharded_instance_norm(
        _sharded_reflect_conv(x, params["conv1"], stride=2), params["norm1"], relu=True
    )
    h = _sharded_instance_norm(
        _sharded_reflect_conv(h, params["conv2"], stride=2), params["norm2"], relu=True
    )
    for rb in params["res_blocks"]:
        y = _sharded_instance_norm(
            _sharded_reflect_conv(h, rb["conv1"]), rb["in1"], relu=True
        )
        y = _sharded_instance_norm(
            _sharded_reflect_conv(y, rb["conv2"]), rb["in2"], relu=False
        )
        h = h + y
    h = _sharded_instance_norm(
        _sharded_conv_transpose(h, params["up1"]), params["norm3"], relu=True
    )
    h = _sharded_instance_norm(
        _sharded_conv_transpose(h, params["up2"]), params["norm4"], relu=True
    )
    return _sharded_reflect_conv(h, params["final_conv"])


def make_spatial_forward(plan: MeshPlan):
    """Jitted H-sharded eval forward over ``plan``'s 'space' axis.

    Input: NHWC with H divisible by 4 * n_space_shards. Params replicated.
    """
    if "space" not in plan.mesh.axis_names:
        raise ValueError("mesh has no 'space' axis; build with make_mesh_plan(spatial=N)")
    kwargs = dict(
        mesh=plan.mesh,
        in_specs=(P(), P(None, AXIS, None, None)),
        out_specs=P(None, AXIS, None, None),
    )
    try:  # jax>=0.8 names the replication check 'check_vma'; older 'check_rep'
        fwd = shard_map(_spatial_forward, check_vma=False, **kwargs)
    except TypeError:
        fwd = shard_map(_spatial_forward, check_rep=False, **kwargs)
    return jax.jit(fwd)


def stylize_spatial(params: Any, image: jnp.ndarray, plan: MeshPlan) -> jnp.ndarray:
    """Stylize an NHWC batch with H sharded across the 'space' axis.

    Pads H (reflect) to a multiple of 4 * n_shards, crops the output back.
    """
    n_shards = plan.mesh.shape[AXIS]
    mult = 4 * n_shards
    n, h, w, c = image.shape
    ph = -h % mult
    pw = -w % 4
    x = image
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
    fwd = make_spatial_forward(plan)
    out = fwd(params, x)
    if ph or pw:
        # crop host-side: slicing a sharded dim to a non-divisible extent is
        # not expressible as a sharded op
        return jnp.asarray(jax.device_get(out)[:, :h, :w, :])
    return out
