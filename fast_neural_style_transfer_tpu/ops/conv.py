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
    w = w.astype(x.dtype)
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
) -> jnp.ndarray:
    """Reflection-padded conv: pad = k//2 both sides, then VALID conv."""
    k = w.shape[0]
    pad = k // 2
    if pad:
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    out = _conv(x, w, stride, "VALID", accum_dtype=accum_dtype)
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
) -> jnp.ndarray:
    """Zero-padded conv with PyTorch ``padding=k//2`` semantics (VGG convs)."""
    k = w.shape[0]
    pad = k // 2
    out = _conv(x, w, stride, ((pad, pad), (pad, pad)), accum_dtype=accum_dtype)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def conv_transpose2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray],
    *,
    stride: int,
    padding: int,
    output_padding: int,
    accum_dtype=jnp.float32,
) -> jnp.ndarray:
    """PyTorch-exact transposed conv.

    ``w`` is HWIO from the transposed op's perspective: (kh, kw, in_ch, out_ch)
    where in_ch is the channel count of ``x``.

    PyTorch's ConvTranspose2d(stride=s, padding=p, output_padding=op) is a
    forward conv over the stride-dilated input with the kernel flipped
    spatially, low-side padding ``k-1-p`` and high-side padding
    ``k-1-p+op``:  out = (in-1)*s - 2p + k + op.
    """
    k = w.shape[0]
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


def max_pool2d(x: jnp.ndarray, *, window: int = 2, stride: int = 2) -> jnp.ndarray:
    """VALID max pool (VGG pool layers: 2x2 stride 2)."""
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )
