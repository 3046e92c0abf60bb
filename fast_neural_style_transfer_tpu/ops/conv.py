"""Convolution ops in NHWC (TPU-native) layout.

Weight layout is HWIO (kh, kw, in_ch, out_ch) everywhere — XLA's native conv
layout, which tiles directly onto the MXU. Converters in
``export/torch_convert.py`` handle OIHW<->HWIO for PyTorch interchange.

Semantics reproduced from the reference:
- ``reflect_conv2d``: ReflectionPad2d(k//2) + valid Conv2d
  (reference ConvLayer, /root/reference/models/model.py:67-75).
- ``conv_transpose2d``: PyTorch ``ConvTranspose2d(kernel, stride, padding,
  output_padding)`` semantics exactly (reference UpsampleConv,
  /root/reference/models/model.py:7-22) — realized as an input-dilated forward
  conv with a spatially flipped kernel, which XLA lowers onto the MXU.
- ``conv2d_same`` / ``max_pool2d``: the VGG19 building blocks (3x3 zero-pad
  SAME conv, 2x2/2 max pool) used by the loss network
  (/root/reference/models/vgg19_net.py:26-51 via torchvision).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

DIMS = ("NHWC", "HWIO", "NHWC")


def reflect_pad_hw(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Reflect-pad H and W of an NHWC batch by ``pad`` on each side.

    jnp.pad('reflect') it is: a strip-sized reversed-slice + concat variant
    was built and TRACED SLOWER on v5e (b20 train step 89.9 vs 88.9 ms —
    XLA's pad/reverse fusions beat the concat chain; the 'reverse' HLO time
    did not even drop). Keeping the one-liner.
    """
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def _conv(
    x: jnp.ndarray,
    w: jnp.ndarray,
    stride: int,
    padding,
    *,
    lhs_dilation=None,
    accum_dtype=jnp.float32,
) -> jnp.ndarray:
    # preferred_element_type is passed only when it matches the input dtype:
    # this JAX version can't transpose (grad) a conv whose output dtype
    # differs from its inputs'. bf16 convs still accumulate in f32 inside the
    # MXU (XLA's hardware default); only the *stored* output is bf16.
    # Integer convs (int8 quantized inference, infer/quantized.py) are the
    # exception: they MUST emit the int32 accumulator (an int8 output would
    # wrap), and they are inference-only so transposability doesn't apply.
    w = w.astype(x.dtype)
    if jnp.issubdtype(x.dtype, jnp.integer):
        pet = accum_dtype
    else:
        pet = accum_dtype if jnp.dtype(accum_dtype) == x.dtype else None
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=padding,
        lhs_dilation=lhs_dilation,
        dimension_numbers=DIMS,
        preferred_element_type=pet,
    )


def reflect_conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray],
    *,
    stride: int = 1,
    accum_dtype=jnp.float32,
    lowering: str = "auto",
) -> jnp.ndarray:
    """Reflection-padded conv: pad = k//2 both sides, then VALID conv.

    ``lowering``:
    - "direct": one ``conv_general_dilated`` (reference semantics 1:1);
    - "s2d": space-to-depth reformulation (see ``_reflect_conv2d_s2d``) —
      mathematically identical, far better MXU utilization for the 9x9
      convs whose tiny channel counts otherwise waste the 128-wide MXU
      (measured on v5e: the final 9x9 32->3 conv is 62% of the whole
      stylizer forward under the direct lowering);
    - "auto": s2d on TPU for k=9 with stride 1 or 2, direct otherwise.
    """
    k = w.shape[0]
    if lowering not in ("auto", "direct", "s2d", "same_delta"):
        raise ValueError(f"unknown conv lowering {lowering!r}")
    if lowering == "same_delta":
        if k % 2 == 0 or stride != 1 or x.shape[1] <= k // 2 or x.shape[2] <= k // 2:
            raise ValueError(
                "same_delta lowering needs odd k, stride 1, dims > k//2"
            )
        return _reflect_conv2d_same_delta(x, w, b, accum_dtype=accum_dtype)
    use_s2d = lowering == "s2d"
    if lowering == "auto" and jax.default_backend() == "tpu":
        hp, wp = x.shape[1] + 2 * (k // 2), x.shape[2] + 2 * (k // 2)
        if k == 9 and stride in (1, 2) and hp % 4 == 0 and wp % 4 == 0:
            use_s2d = True  # tiny-channel 9x9s: 9.8x on the final conv
        elif (k == 3 and stride == 1 and x.shape[0] >= 4
              and x.shape[1] >= 4 and x.shape[2] >= 4):
            # res-block convs at TRAINING batch sizes: zero-pad SAME +
            # border-delta strips beats a materialized reflect pad — measured
            # 89.2 -> 83.4 ms on the b20 bf16 train step (v5e), the pad
            # fusions and their slice+add adjoints being pure memory traffic.
            # At batch 1 (inference) the extra strip-conv launches LOSE
            # (p50 0.80 -> 1.34 ms), hence the N >= 4 gate.
            return _reflect_conv2d_same_delta(x, w, b, accum_dtype=accum_dtype)
        # NOT k3/s2 (encoder conv2): the s2d(2) form was traced at +1.0 ms
        # on the b20 train step (layout copies outweigh the denser dx conv);
        # it remains reachable via lowering="s2d".
    if use_s2d:
        return _reflect_conv2d_s2d(x, w, b, stride=stride, accum_dtype=accum_dtype)
    pad = k // 2
    if pad:
        x = reflect_pad_hw(x, pad)
    out = _conv(x, w, stride, "VALID", accum_dtype=accum_dtype)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def _s2d_kernel(w: jnp.ndarray, s: int, stride: int):
    """Rearrange a (k, k, C, O) kernel for space-to-depth(s) input with an
    original conv stride ``stride`` (stride must divide s).

    Input s2d channel order: (cy, cx, c). Each s2d cell yields
    p = s // stride output pixels per dim, as output channels (oy, ox, o)
    depth-to-space'd back by the caller when p > 1.

    Derivation: strided output index j = p*m + oy reads padded input rows
    stride*j + dy' = s*(m + ky) + cy, i.e. the rearranged tap is
    dy = s*ky + cy - stride*oy, masked to [0, k-1]. Kernel height
    k' = ceil((k + stride*(p - 1)) / s).
    """
    import numpy as np_  # host-side index construction (static)

    k, _, c_in, c_out = w.shape
    if s % stride:
        raise ValueError(f"s2d factor {s} must be a multiple of stride {stride}")
    n_out_phase = s // stride
    kp = -(-(k + stride * (n_out_phase - 1)) // s)

    ky = np_.arange(kp)[:, None, None]          # (kp, 1, 1)
    cy = np_.arange(s)[None, :, None]           # (1, s, 1)
    oy = np_.arange(n_out_phase)[None, None, :]  # (1, 1, p)
    dy = s * ky + cy - stride * oy               # (kp, s, p)
    valid_y = (dy >= 0) & (dy < k)
    dy_c = np_.clip(dy, 0, k - 1)

    # gather: w2[ky, cy, oy, kx, cx, ox, c, o] = w[dy, dx, c, o] * mask
    w2 = jnp.asarray(w)[dy_c.reshape(-1)][:, dy_c.reshape(-1)]
    w2 = w2.reshape(kp, s, n_out_phase, kp, s, n_out_phase, c_in, c_out)
    mask = (valid_y.reshape(kp, s, n_out_phase, 1, 1, 1)
            & valid_y.reshape(1, 1, 1, kp, s, n_out_phase))
    w2 = jnp.where(jnp.asarray(mask)[..., None, None], w2, 0)
    # -> (ky, kx, (cy, cx, c), (oy, ox, o))
    w2 = jnp.transpose(w2, (0, 3, 1, 4, 6, 2, 5, 7))
    return w2.reshape(kp, kp, s * s * c_in, n_out_phase * n_out_phase * c_out)


def _reflect_conv2d_s2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray],
    *,
    stride: int,
    accum_dtype=jnp.float32,
    s: Optional[int] = None,
) -> jnp.ndarray:
    """k=9 reflect conv via space-to-depth(s): identical math, MXU-shaped.

    Defaults: stride 1 -> s=4 (3x3 conv over 16*C channels, 16 output
    phases depth-to-space'd back); stride 2 -> s=4 (3x3 conv over 16*C
    channels, 4 output phases).
    """
    k = w.shape[0]
    pad = k // 2
    n, h, w_dim, c = x.shape
    hp, wp = h + 2 * pad, w_dim + 2 * pad
    if s is None:
        # largest factor that stride divides and that tiles the padded dims
        for cand in (4, 2, stride):
            if cand % stride == 0 and hp % cand == 0 and wp % cand == 0:
                s = cand
                break
        else:
            raise ValueError(
                f"no space-to-depth factor fits stride={stride}, padded dims "
                f"({hp}, {wp}); use lowering='direct' for this shape"
            )
    if s % stride or hp % s or wp % s:
        raise ValueError(
            f"s2d factor {s} incompatible with stride={stride}, padded dims "
            f"({hp}, {wp})"
        )
    xp = reflect_pad_hw(x, pad)
    out = _s2d_conv_padded(xp, w, stride, s, accum_dtype)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def _s2d_conv_padded(xp, w, stride, s, accum_dtype):
    """Core s2d conv on an already-padded NHWC input (any pad mode)."""
    n, hp, wp, c = xp.shape
    p = s // stride
    # one split/merge per reshape: sharding propagation (sharded batch dim)
    # rejects reshapes that split or merge multiple axes at once
    xs = xp.reshape(n, hp // s, s, wp, c)
    xs = xs.reshape(n, hp // s, s, wp // s, s, c)
    xs = jnp.transpose(xs, (0, 1, 3, 2, 4, 5))
    xs = xs.reshape(n, hp // s, wp // s, s, s * c)
    xs = xs.reshape(n, hp // s, wp // s, s * s * c)
    w2 = _s2d_kernel(w, s, stride).astype(xp.dtype)
    out = _conv(xs, w2, 1, "VALID", accum_dtype=accum_dtype)
    c_out = w.shape[3]
    if p > 1:
        ho, wo = out.shape[1], out.shape[2]
        out = out.reshape(n, ho, wo, p, p * c_out)
        out = out.reshape(n, ho, wo, p, p, c_out)
        out = jnp.transpose(out, (0, 1, 3, 2, 4, 5))
        out = out.reshape(n, ho * p, wo, p, c_out)
        out = out.reshape(n, ho * p, wo * p, c_out)
    return out


def _conv2d_same_s2d_s1(x, w, *, s: int = 4, accum_dtype=jnp.float32):
    """Zero-pad SAME, stride-1, odd-k conv via space-to-depth(s).

    Built for *gradient* convs whose tiny output-channel count otherwise
    wastes the 128-lane MXU (e.g. d(loss)/d(stylized) through VGG conv1_1 is
    a 64->3 conv at 256^2 — measured 6.0 ms/step of the b20 train step under
    the direct lowering). Alignment padding goes on the high side (zeros,
    beyond the SAME window) and the output is sliced back to (h, w).
    """
    k = w.shape[0]
    pad = k // 2
    n, h, wd, c = x.shape
    # coarse kernel span (stride 1, p=s output phases): ceil((k + s - 1) / s)
    kp = -(-(k + s - 1) // s)
    fine_span = (kp - 1) * s  # fine_out = hp - fine_span

    def hi_pad(dim):
        e = max(0, fine_span - 2 * pad)
        while (dim + 2 * pad + e) % s:
            e += 1
        return pad + e

    xp = jnp.pad(x, ((0, 0), (pad, hi_pad(h)), (pad, hi_pad(wd)), (0, 0)))
    out = _s2d_conv_padded(xp, w, 1, s, accum_dtype)
    return out[:, :h, :wd, :]


def _conv2d_same_direct(x, w, b, stride, accum_dtype):
    k = w.shape[0]
    pad = k // 2
    out = _conv(x, w, stride, ((pad, pad), (pad, pad)), accum_dtype=accum_dtype)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


@jax.custom_vjp
def _conv2d_same_smallc(x, w, b):
    """k3/s1 SAME conv whose INPUT has <=4 channels (VGG conv1_1) with an
    s2d-lowered d(out)/d(x) — a NEGATIVE result kept as an opt-in.

    Motivation: XLA's default dx here is a 64->3-channel conv (3/128 MXU
    lanes) that showed as a 6.0 ms fusion in the b20 train-step trace. The
    s2d form folds output phases into channels (N=48) — but measured WORSE
    in context on v5e (10.3 vs 7.4 ms for a conv1_1+relu+conv grad chain,
    both s=4 and s=2): the saved MXU time is repaid in pad + layout-copy
    HLOs transforming the 168 MB 64-channel gradient, and XLA loses the
    fusion that computed db/clamp masks inside the big dx fusion. dw/db use
    the standard adjoints (DCE'd entirely when VGG is frozen).
    """
    return _conv2d_same_direct(x, w, b, 1, jnp.float32)


def _conv2d_same_smallc_fwd(x, w, b):
    return _conv2d_same_smallc(x, w, b), (x, w, b)


def _conv2d_same_smallc_bwd(res, g):
    x, w, b = res
    # dx: correlate g with the io-swapped, spatially flipped kernel — an
    # equal-FLOP conv whose output channels = C_in; s2d keeps the MXU fed
    wT = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))
    dx = _conv2d_same_s2d_s1(g, wT).astype(x.dtype)
    # dw: conv is linear in w; transpose without re-running the forward
    (dw,) = jax.linear_transpose(
        lambda w_: _conv(x, w_, 1, ((1, 1), (1, 1))), w
    )(g.astype(x.dtype))
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2))
    return dx, dw.astype(w.dtype), db.astype(b.dtype)


_conv2d_same_smallc.defvjp(_conv2d_same_smallc_fwd, _conv2d_same_smallc_bwd)


def _dx_tap_packed(g: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """d(out)/d(x) of a stride-1 SAME conv, tap-packed for tiny C_in.

    The standard input-grad of a k x k conv with C_in=3 is a C_out->3 conv:
    3 of 128 MXU lanes used, and XLA's chosen layout makes it the single
    hottest op of the b20 train step (6.0 ms for VGG conv1_1 dx). Folding
    the k*k taps INTO the output-channel dim fixes the shape without
    touching the big gradient tensor's layout (the round-1 s2d attempt
    failed by rearranging the 168 MB gradient spatially):

        P[., (u,v,i)] = sum_o g[., o] * wT[u,v,o,i]      (1x1 conv, N=k*k*Ci)
        dx[h,w,i]     = sum_{u,v} P[h+u-p, w+v-p, (u,v,i)]

    One MXU-shaped matmul (k*k fewer MXU passes than the direct form) plus
    k*k static shifted adds that XLA fuses into one loop fusion.
    """
    k, _, ci, co = w.shape
    p = k // 2
    n, h, wd, _ = g.shape
    # wT[u,v,o,i] = w[k-1-u, k-1-v, i, o]; pack (u,v,i) into output channels
    wT = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))          # (k,k,co,ci)
    wpack = jnp.transpose(wT, (2, 0, 1, 3)).reshape(1, 1, co, k * k * ci)
    P = _conv(g, wpack.astype(g.dtype), 1, "VALID")           # (n,h,w,k²ci)
    Pp = jnp.pad(P, ((0, 0), (p, p), (p, p), (0, 0)))
    dx = None
    for u in range(k):
        for v in range(k):
            c0 = (u * k + v) * ci
            term = lax.slice(
                Pp, (0, u, v, c0), (n, u + h, v + wd, c0 + ci)
            )
            dx = term if dx is None else dx + term
    return dx


@jax.custom_vjp
def _conv2d_same_tappack(x, w, b):
    """k-odd/s1 SAME conv with a tap-packed d(out)/d(x) (see _dx_tap_packed).

    MEASURED SLOWER IN CONTEXT — kept as an explicit opt-in, not in "auto".
    The packed 1x1 conv itself is ~9x fewer MXU passes than the direct
    64->3 input-grad conv, but the k*k shifted slice-adds materialize and
    re-read the (b,256,256,k*k*ci) f32 intermediate instead of fusing into
    one loop, and the b20 bf16 train step regresses 88.1 -> 107.7 ms on
    v5e (A/B with only this lowering toggled). Same lesson as
    _conv2d_same_smallc: conv1_1's dx is HBM-bound on the 168 MB gradient,
    not MXU-bound, so reshaping the matmul cannot pay for extra traffic."""
    return _conv2d_same_direct(x, w, b, 1, jnp.float32)


def _conv2d_same_tappack_fwd(x, w, b):
    return _conv2d_same_tappack(x, w, b), (x, w, b)


def _conv2d_same_tappack_bwd(res, g):
    x, w, b = res
    dx = _dx_tap_packed(g, w).astype(x.dtype)
    (dw,) = jax.linear_transpose(
        lambda w_: _conv(x, w_, 1, ((w.shape[0] // 2,) * 2,) * 2), w
    )(g.astype(x.dtype))
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2))
    return dx, dw.astype(w.dtype), db.astype(b.dtype)


_conv2d_same_tappack.defvjp(_conv2d_same_tappack_fwd, _conv2d_same_tappack_bwd)


@jax.custom_vjp
def _conv2d_same_pallas_dx(x, w, b):
    """k-odd/s1 SAME conv whose WHOLE backward (dx + dw + db) runs as the
    Pallas planar tap-packed kernel (ops/pallas_conv.py). Forward is
    identical to the direct path. MEASURED SLOWER IN THE FULL TRAIN STEP
    in every wiring (the custom-call layout seam costs more than the 5x
    isolated op win) — opt-in only; see ops/pallas_conv.py's module
    docstring for the full measurement chain."""
    return _conv2d_same_direct(x, w, b, 1, jnp.float32)


def _conv2d_same_pallas_dx_fwd(x, w, b):
    return _conv2d_same_pallas_dx(x, w, b), (x, w, b)


def _conv2d_same_pallas_dx_bwd(res, g):
    from fast_neural_style_transfer_tpu.ops.pallas_conv import conv2d_same_bwd

    x, w, b = res
    dx, dw, db = conv2d_same_bwd(g, x, w)
    return dx.astype(x.dtype), dw.astype(w.dtype), db.astype(b.dtype)


_conv2d_same_pallas_dx.defvjp(_conv2d_same_pallas_dx_fwd,
                              _conv2d_same_pallas_dx_bwd)


def _reflect_conv2d_same_delta(x, w, b, *, accum_dtype=jnp.float32):
    """Odd-k stride-1 reflect conv as zero-pad SAME conv + exact border
    corrections.

    A materialized reflect pad costs a full read+write of the activation per
    conv (and a slice+add chain in its adjoint); zero padding is free inside
    ``conv_general_dilated`` (and for k=9 the s2d zero-pad form applies).
    The difference between the two pads lives only on the p-px pad ring
    (p = k//2), whose contribution to the output is confined to the p-px
    output border — computed here with four strip convs (pxW / Hxp) and
    added in place. Exact partition of the ring: top/bottom row bands span
    the full padded width (corners reflect both dims, which equals the
    band rows' own horizontal reflect-extension); left/right column bands
    cover only padded rows p..H+p-1 (zero-extended ends), so every ring
    cell is counted exactly once. Autodiff never sees a reflect-pad adjoint.
    """
    n, h, wd, c = x.shape
    k = w.shape[0]
    p = k // 2

    if (
        k == 9
        and jax.default_backend() == "tpu"
        and (h + 2 * p) % 4 == 0
        and (wd + 2 * p) % 4 == 0
    ):
        # zero-pad SAME, MXU-shaped; forward accum_dtype so integer-exact
        # accumulation survives this branch too (int8 callers rely on it)
        out = _conv2d_same_s2d_s1(x, w, accum_dtype=accum_dtype)
    else:
        out = _conv(x, w, 1, ((p, p), (p, p)), accum_dtype=accum_dtype)

    def hext(v):
        # horizontal reflect-extension by p (ring rows' corner values)
        return jnp.concatenate(
            [v[:, :, p:0:-1], v, v[:, :, -2 : -p - 2 : -1]], axis=2
        )

    # top band: padded rows 0..p-1 = x rows p..1; affects output rows 0..p-1
    top = hext(x[:, p:0:-1])  # (n, p, W+2p, c)
    top = jnp.pad(top, ((0, 0), (0, k - 1), (0, 0), (0, 0)))
    d_top = _conv(top, w, 1, "VALID", accum_dtype=accum_dtype)

    # bottom band: padded rows H+p..H+2p-1 = x rows H-2..H-p-1
    bot = hext(x[:, -2 : -p - 2 : -1])
    bot = jnp.pad(bot, ((0, 0), (k - 1, 0), (0, 0), (0, 0)))
    d_bot = _conv(bot, w, 1, "VALID", accum_dtype=accum_dtype)

    # left band: padded cols 0..p-1 = x cols p..1, padded rows p..H+p-1 only
    left = x[:, :, p:0:-1]  # (n, H, p, c)
    left = jnp.pad(left, ((0, 0), (p, p), (0, k - 1), (0, 0)))
    d_left = _conv(left, w, 1, "VALID", accum_dtype=accum_dtype)

    # right band: padded cols W+p..W+2p-1 = x cols W-2..W-p-1
    right = x[:, :, -2 : -p - 2 : -1]
    right = jnp.pad(right, ((0, 0), (p, p), (k - 1, 0), (0, 0)))
    d_right = _conv(right, w, 1, "VALID", accum_dtype=accum_dtype)

    out = out.at[:, :p, :, :].add(d_top.astype(out.dtype))
    out = out.at[:, -p:, :, :].add(d_bot.astype(out.dtype))
    out = out.at[:, :, :p, :].add(d_left.astype(out.dtype))
    out = out.at[:, :, -p:, :].add(d_right.astype(out.dtype))
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def conv2d_same(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray],
    *,
    stride: int = 1,
    accum_dtype=jnp.float32,
    lowering: str = "auto",
) -> jnp.ndarray:
    """Zero-padded conv with PyTorch ``padding=k//2`` semantics (VGG convs).

    ``lowering="smallc_s2d"`` opts into the s2d-gradient custom VJP for
    k3/s1/C_in<=4, ``lowering="tappack"`` into the XLA-level tap-packed
    input-grad for k*k*C_in<=128, and ``lowering="pallas_dx"`` into the
    Pallas planar tap-packed backward (ops/pallas_conv.py) — all three
    measured slower in the full train step and therefore excluded from
    "auto" (see each implementation's docstring for the measurement; the
    Pallas kernel wins 5x in isolation but the custom-call layout seam
    costs more than the op saves).
    """
    k = w.shape[0]
    if (
        lowering == "smallc_s2d"
        and k == 3
        and stride == 1
        and w.shape[2] <= 4
        and b is not None
        and jnp.dtype(accum_dtype) == jnp.float32
    ):
        return _conv2d_same_smallc(x, w, b)
    if (
        lowering == "tappack"
        and stride == 1
        and k % 2 == 1
        and k * k * w.shape[2] <= 128
        and b is not None
        and jnp.dtype(accum_dtype) == jnp.float32
    ):
        return _conv2d_same_tappack(x, w, b)
    if (
        lowering == "pallas_dx"
        and stride == 1
        and b is not None
        and jnp.dtype(accum_dtype) == jnp.float32
    ):
        from fast_neural_style_transfer_tpu.ops import pallas_conv

        g_shape = x.shape[:3] + (w.shape[3],)
        if pallas_conv.supported(g_shape, w.shape):
            return _conv2d_same_pallas_dx(x, w, b)
    return _conv2d_same_direct(x, w, b, stride, accum_dtype)


def conv_transpose2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray],
    *,
    stride: int,
    padding: int,
    output_padding: int,
    accum_dtype=jnp.float32,
    lowering: str = "auto",
) -> jnp.ndarray:
    """PyTorch-exact transposed conv.

    ``w`` is HWIO from the transposed op's perspective: (kh, kw, in_ch, out_ch)
    where in_ch is the channel count of ``x``.

    PyTorch's ConvTranspose2d(stride=s, padding=p, output_padding=op) is a
    forward conv over the stride-dilated input with the kernel flipped
    spatially, low-side padding ``k-1-p`` and high-side padding
    ``k-1-p+op``:  out = (in-1)*s - 2p + k + op.

    ``lowering="subpixel"`` decomposes the dilated conv into 4 dense phase
    convs + interleave (no lhs_dilation). Measured on v5e at the decoder's
    shapes it is SLOWER than XLA's dilated conv (whole bf16 forward 1.28 ms
    vs 0.91 ms) — the 4 launches + interleave outweigh the dilation cost at
    these sizes — so ``"auto"`` resolves to direct and subpixel stays an
    explicit opt-in (useful template for larger-channel decoders).
    """
    k = w.shape[0]
    if lowering not in ("auto", "direct", "subpixel"):
        raise ValueError(f"unknown conv_transpose lowering {lowering!r}")
    use_subpixel = lowering == "subpixel"
    if use_subpixel:
        if (k, stride, padding, output_padding) != (3, 2, 1, 1):
            raise ValueError("subpixel lowering implemented for k3/s2/p1/op1 only")
        return _conv_transpose_subpixel(x, w, b, accum_dtype=accum_dtype)
    pad_lo = k - 1 - padding
    pad_hi = k - 1 - padding + output_padding
    if pad_lo < 0:
        raise ValueError(f"padding {padding} too large for kernel {k}")
    wf = w[::-1, ::-1, :, :]
    out = _conv(
        x,
        wf,
        1,
        ((pad_lo, pad_hi), (pad_lo, pad_hi)),
        lhs_dilation=(stride, stride),
        accum_dtype=accum_dtype,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def _conv_transpose_subpixel(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray],
    *,
    accum_dtype=jnp.float32,
) -> jnp.ndarray:
    """k3/s2/p1/op1 transpose conv as 4 dense phase convs + interleave.

    With flipped kernel wf and dilated-input padding (1, 2), output row
    2m (even phase) reads only input row m through wf[1]; output row 2m+1
    (odd phase) reads rows m, m+1 through wf[0], wf[2] (zero row past the
    end — lax/torch transpose padding is zeros). Same per column.
    """
    n, h, w_dim, c = x.shape
    wf = w[::-1, ::-1, :, :]
    xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))  # one zero row/col high

    def phase(ky_taps, kx_taps):
        # build the (len(ky), len(kx), C, O) kernel from flipped-kernel taps
        kk = wf[jnp.asarray(ky_taps)][:, jnp.asarray(kx_taps)]
        src = xp if (len(ky_taps) > 1 or len(kx_taps) > 1) else x
        # VALID conv; for 1-tap dims use the unpadded input directly
        hi = h + 1 if len(ky_taps) > 1 else h
        wi = w_dim + 1 if len(kx_taps) > 1 else w_dim
        return _conv(src[:, :hi, :wi], kk, 1, "VALID", accum_dtype=accum_dtype)

    ee = phase([1], [1])          # out[2m,   2n]
    eo = phase([1], [0, 2])       # out[2m,   2n+1]
    oe = phase([0, 2], [1])       # out[2m+1, 2n]
    oo = phase([0, 2], [0, 2])    # out[2m+1, 2n+1]
    # interleave phases -> (N, 2H, 2W, O)
    row_even = jnp.stack([ee, eo], axis=3)  # (N, H, W, 2, O)
    row_odd = jnp.stack([oe, oo], axis=3)
    out = jnp.stack([row_even, row_odd], axis=2)  # (N, H, 2, W, 2, O)
    c_out = w.shape[3]
    out = out.reshape(n, 2 * h, 2 * w_dim, c_out)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def _reduce_window_max(x: jnp.ndarray, window: int, stride: int) -> jnp.ndarray:
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )


def _up2(y: jnp.ndarray) -> jnp.ndarray:
    """Nearest 2x upsample NHWC (broadcast, no gather)."""
    n, h, w, c = y.shape
    y = jnp.broadcast_to(y[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return y.reshape(n, 2 * h, w, 2, c).reshape(n, 2 * h, 2 * w, c)


@jax.custom_vjp
def _max_pool2x2(x: jnp.ndarray) -> jnp.ndarray:
    return _reduce_window_max(x, 2, 2)


def _max_pool2x2_fwd(x):
    y = _reduce_window_max(x, 2, 2)
    return y, (x, y)


def _max_pool2x2_bwd(res, g):
    # XLA's default max-pool gradient is select-and-scatter — measured 3.4 ms
    # for ONE (20,256,256,64) bf16 pool backward on v5e. The mask form below
    # is a handful of VPU/bandwidth passes (~0.5 ms): route the output grad to
    # every input equal to the window max, split evenly among ties. (PyTorch
    # routes tied gradients to the first argmax index; ties are exact float
    # equalities — e.g. post-ReLU zeros — where the even split is the cleaner
    # subgradient and has the same expectation.)
    x, y = res
    n, h, w, c = x.shape
    he, we = 2 * (h // 2), 2 * (w // 2)
    xe = x[:, :he, :we, :]
    mask = (xe == _up2(y)).astype(jnp.float32)
    ties = lax.reduce_window(
        mask, 0.0, lax.add,
        window_dimensions=(1, 2, 2, 1), window_strides=(1, 2, 2, 1),
        padding="VALID",
    )
    dx = mask * _up2(g.astype(jnp.float32) / ties)
    if (he, we) != (h, w):  # odd trailing row/col never entered the pool
        dx = jnp.pad(dx, ((0, 0), (0, h - he), (0, w - we), (0, 0)))
    return (dx.astype(x.dtype),)


_max_pool2x2.defvjp(_max_pool2x2_fwd, _max_pool2x2_bwd)


def max_pool2d(
    x: jnp.ndarray, *, window: int = 2, stride: int = 2, grad: str = "default"
) -> jnp.ndarray:
    """VALID max pool (VGG pool layers: 2x2 stride 2).

    ``grad="mask"`` (2x2/2 only) swaps XLA's select-and-scatter gradient for
    a mask-based VJP. Measured on v5e b20 bf16: the mask form is SLOWER in
    isolation (8.7 vs 5.0 ms fwd+bwd at 256^2x64) and select-and-scatter is
    only ~1.5 ms/step of the b20 train step in context, so the default stays
    XLA's. Kept as an opt-in template (negative result, like ops/pallas_norm).
    """
    if grad == "mask" and window == 2 and stride == 2:
        return _max_pool2x2(x)
    return _reduce_window_max(x, window, stride)
