"""H-sharded (mesh 'space' axis) building blocks for shard_map programs.

Everything a stylizer forward, a VGG-19 forward, and the perceptual losses
need when the image height dimension is sharded across chips:

- reflect / zero-pad convs with per-layer halo exchange over ICI
  (``lax.ppermute``), reflecting or zero-padding at the true image edges so
  results are bit-identical to the unsharded ops;
- the decoder's k3/s2/p1/op1 transpose conv (one halo row from the next
  shard, zeros at the global bottom — lax/torch transpose padding is zeros);
- instance norm with two-pass global statistics via ``lax.psum``;
- Gram matrix / content / TV losses with their cross-shard reductions
  (TV additionally needs the seam term between adjacent shards).

All functions assume NHWC slabs and must run inside ``shard_map`` with the
axis name passed as ``axis`` (default "space").
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

AXIS = "space"


def from_prev(rows: jnp.ndarray, axis: str = AXIS) -> jnp.ndarray:
    """Each shard receives ``rows`` from its previous (upper) neighbor."""
    n = lax.axis_size(axis)
    return lax.ppermute(rows, axis, [(i, (i + 1) % n) for i in range(n)])


def from_next(rows: jnp.ndarray, axis: str = AXIS) -> jnp.ndarray:
    n = lax.axis_size(axis)
    return lax.ppermute(rows, axis, [(i, (i - 1) % n) for i in range(n)])


def halo_extend(x: jnp.ndarray, p: int, *, mode: str, axis: str = AXIS) -> jnp.ndarray:
    """Extend the local H slab by p rows per side: real neighbor rows inside
    the image; at the true image edges, reflection (``mode='reflect'``,
    torch ReflectionPad) or zeros (``mode='zero'``, torch Conv2d padding)."""
    if p == 0:
        return x
    h = x.shape[1]
    need = p + 1 if mode == "reflect" else p
    if h < need:
        raise ValueError(
            f"local H slab of {h} rows is too small for a halo of p={p} "
            f"({mode} mode needs >= {need} rows per shard); use fewer "
            f"'{axis}' shards or a taller image"
        )
    top_halo = from_prev(x[:, -p:], axis)
    bot_halo = from_next(x[:, :p], axis)
    if mode == "reflect":
        top_edge = x[:, 1 : p + 1][:, ::-1]
        bot_edge = x[:, -p - 1 : -1][:, ::-1]
    elif mode == "zero":
        top_edge = jnp.zeros_like(top_halo)
        bot_edge = jnp.zeros_like(bot_halo)
    else:
        raise ValueError(f"unknown halo mode {mode!r}")
    idx = lax.axis_index(axis)
    n = lax.axis_size(axis)
    top = jnp.where(idx == 0, top_edge, top_halo)
    bot = jnp.where(idx == n - 1, bot_edge, bot_halo)
    return jnp.concatenate([top, x, bot], axis=1)


def global_row_index(local_h: int, axis: str = AXIS) -> jnp.ndarray:
    """(local_h,) int32 vector of each local row's GLOBAL H index."""
    return lax.axis_index(axis) * local_h + jnp.arange(local_h, dtype=jnp.int32)


def mask_rows_from(x: jnp.ndarray, extent, axis: str = AXIS) -> jnp.ndarray:
    """Zero every row whose global H index is >= ``extent`` (traced scalar OK).

    The active-extent tool: emulates an array that ends at row ``extent``
    inside a larger equal-slab sharded array, so shard_map programs can
    match an unsharded computation whose H is not divisible by the shard
    count (infer/spatial_adain.py). Zero comm."""
    keep = (global_row_index(x.shape[1], axis) < extent)[None, :, None, None]
    return jnp.where(keep, x, jnp.zeros((), x.dtype))


def fetch_global_row(x: jnp.ndarray, i, axis: str = AXIS) -> jnp.ndarray:
    """Global row ``i`` (traced scalar OK) of an H-sharded NHWC map, as a
    replicated (B, 1, W, C) — a one-hot masked sum + psum, so the owning
    shard needs no static identity. O(one row) of ICI traffic."""
    sel = (global_row_index(x.shape[1], axis) == i)[None, :, None, None]
    return lax.psum(
        jnp.sum(jnp.where(sel, x, jnp.zeros((), x.dtype)), axis=1,
                keepdims=True),
        axis,
    )


def set_global_row(x: jnp.ndarray, i, value: jnp.ndarray,
                   axis: str = AXIS) -> jnp.ndarray:
    """Write replicated (B, 1, W, C) ``value`` into global row ``i`` (traced
    scalar OK); rows outside [0, H_global) are a no-op. Zero comm."""
    put = (global_row_index(x.shape[1], axis) == i)[None, :, None, None]
    return jnp.where(put, value.astype(x.dtype), x)


def pin_reflect_rows(x: jnp.ndarray, extent, pad: int,
                     axis: str = AXIS) -> jnp.ndarray:
    """Make rows [extent, extent+pad) hold the values an unsharded reflect
    pad would supply at an array ENDING at ``extent``: row extent+i :=
    row extent-2-i. With this pinned, a reflect conv's output rows below
    the extent match the unsharded conv on the extent-tall input exactly.
    ``extent`` may be traced; pins past H_global are no-ops (the aligned
    case, where ``halo_extend``'s true global edge already reflects).
    Caller must guarantee H_global - extent >= pad or == 0 — the callers'
    pad targets make both gaps multiples of the conv alignment, which is
    always >= the largest pin. Costs ``pad`` one-row psums."""
    for i in range(pad):
        row = fetch_global_row(x, extent - 2 - i, axis=axis)
        x = set_global_row(x, extent + i, row, axis=axis)
    return x


def _conv_valid(x, w, stride):
    from fast_neural_style_transfer_tpu.ops.conv import _conv

    return _conv(x, w, stride, "VALID")


def reflect_conv2d_sharded(x, w, b, *, stride: int = 1, axis: str = AXIS):
    """ReflectConv with H halo-exchanged; W reflect-padded locally."""
    k = w.shape[0]
    pad = k // 2
    if stride > 1 and x.shape[1] % stride:
        # stride-s windows must start at globally-aligned offsets on every
        # shard; an odd local H would silently compute windows the unsharded
        # conv never evaluates (and emit extra rows)
        raise ValueError(
            f"local H {x.shape[1]} not divisible by stride {stride}; "
            f"sharded strided convs need stride-aligned slabs"
        )
    x = halo_extend(x, pad, mode="reflect", axis=axis)
    x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (0, 0)), mode="reflect")
    out = _conv_valid(x, w, stride)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def conv2d_same_sharded(x, w, b, *, axis: str = AXIS):
    """Zero-padded SAME conv (VGG convs, stride 1) with H halo exchange."""
    k = w.shape[0]
    pad = k // 2
    x = halo_extend(x, pad, mode="zero", axis=axis)
    x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (0, 0)))
    out = _conv_valid(x, w, 1)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def max_pool2d_sharded(x, *, window: int = 2, stride: int = 2):
    """2x2/2 max pool. Windows never cross shard boundaries when the local
    H is even (enforced), so no halo is needed."""
    if x.shape[1] % stride:
        raise ValueError(f"local H {x.shape[1]} not divisible by pool stride {stride}")
    return lax.reduce_window(
        x, -jnp.inf, lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )


def conv_transpose2d_sharded(x, w, b, *, axis: str = AXIS):
    """k3/s2/p1/op1 transpose conv (decoder): halo = 1 row from the NEXT
    shard; the last shard zero-pads (transpose-conv padding is zeros)."""
    halo = from_next(x[:, :1], axis)
    zero = jnp.zeros_like(halo)
    idx = lax.axis_index(axis)
    n = lax.axis_size(axis)
    bot = jnp.where(idx == n - 1, zero, halo)
    ext = jnp.concatenate([x, bot], axis=1)  # h+1 rows
    wf = w[::-1, ::-1, :, :]
    out = lax.conv_general_dilated(
        ext, wf.astype(ext.dtype), (1, 1),
        ((1, 0), (1, 2)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def instance_norm_sharded(x, gamma, beta, *, eps: float = 1e-5,
                          relu: bool = False, axis: str = AXIS, extent=None):
    """IN with global spatial statistics via two-pass psum over ``axis``.

    ``extent`` (traced scalar OK): global active H; rows >= extent are
    excluded from both moments and the count shrinks to extent * W — the
    active-extent tool that keeps slab padding out of the statistics when
    the true height is not divisible by the shard count."""
    xf = x.astype(jnp.float32)
    if extent is None:
        count = x.shape[1] * x.shape[2] * lax.axis_size(axis)
        mean = lax.psum(jnp.sum(xf, axis=(1, 2), keepdims=True), axis) / count
        xc = xf - mean
    else:
        keep = (global_row_index(x.shape[1], axis) < extent)
        keep = keep[None, :, None, None].astype(jnp.float32)
        count = extent.astype(jnp.float32) * x.shape[2]
        mean = lax.psum(jnp.sum(xf * keep, axis=(1, 2), keepdims=True),
                        axis) / count
        xc = (xf - mean) * keep
    var = lax.psum(jnp.sum(xc * xc, axis=(1, 2), keepdims=True), axis) / count
    out = xc * lax.rsqrt(var + eps)
    out = out * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    if relu:
        out = jnp.maximum(out, 0.0)
    return out.astype(x.dtype)


def gram_matrix_sharded(feat: jnp.ndarray, axis: str = AXIS) -> jnp.ndarray:
    """Global (b_local, c, c) Gram of an H-sharded feature map: local partial
    Gram + psum over 'space' (the spatial sum distributes over shards). The
    batch dim stays local — Grams are per-sample."""
    b, h, w, c = feat.shape
    f = feat.reshape(b, h * w, c)
    local = jnp.einsum("bnc,bnd->bcd", f, f, preferred_element_type=jnp.float32)
    return lax.psum(local, axis)


def content_loss_sharded(input_feat, target_feat, axis: str = AXIS,
                         batch_axes=()):
    """Reference content loss (sum-MSE / (c*h_global*w)) over sharded maps.
    ``batch_axes`` names additional mesh axes the BATCH dim is sharded over
    (2-D data x space training): the sum then also psums over them —
    matching the reference, which sums over batch without normalizing."""
    diff = input_feat.astype(jnp.float32) - target_feat.astype(jnp.float32)
    b, h, w, c = input_feat.shape
    h_global = h * lax.axis_size(axis)
    total = lax.psum(jnp.sum(jnp.square(diff)), (axis, *batch_axes))
    return total / (c * h_global * w)


def total_variation_loss_sharded(img, axis: str = AXIS, batch_axes=()):
    """Reference anisotropic TV over an H-sharded image, including the seam
    terms between the last row of shard i and the first row of shard i+1;
    normalized by the GLOBAL batch size when the batch is sharded too."""
    x = img.astype(jnp.float32)
    b, h, w, c = x.shape
    h_global = h * lax.axis_size(axis)
    b_global = b
    for a in batch_axes:
        b_global = b_global * lax.axis_size(a)
    tv_h = jnp.sum(jnp.square(x[:, 1:] - x[:, :-1]))
    tv_w = jnp.sum(jnp.square(x[:, :, 1:] - x[:, :, :-1]))
    # seam: my first row differences against the previous shard's last row;
    # shard 0 has no upper seam
    prev_last = from_prev(x[:, -1:], axis)
    seam = jnp.sum(jnp.square(x[:, :1] - prev_last))
    seam = jnp.where(lax.axis_index(axis) == 0, 0.0, seam)
    total = lax.psum(tv_h + tv_w + seam, (axis, *batch_axes))
    return total / (b_global * c * h_global * w)
