"""Shape/padding utilities for TPU-friendly static shapes.

The stylizer is fully convolutional (reference: /root/reference/models/model.py
accepts arbitrary resolutions per README.md:112-115). Under jit every distinct
input shape triggers a compile, so arbitrary-resolution inference pads inputs up
to a shape *bucket* (reflect padding, which the stylizer's own reflection-padded
convs make visually benign) and crops the output back.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def round_up_to_multiple(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def bucket_hw(h: int, w: int, multiple: int = 64) -> Tuple[int, int]:
    """Pick the padded (H, W) bucket for an input of size (h, w).

    The encoder/decoder is an exact 4x down/up pipeline (two stride-2 convs,
    two stride-2 transpose convs with output_padding=1 — reference
    models/model.py:28-47), so any multiple of 4 round-trips exactly.  We use a
    coarser default bucket (64) to bound the number of distinct compiled shapes.
    """
    if multiple % 4 != 0:
        raise ValueError("bucket multiple must be divisible by 4 for exact 4x round-trip")
    return round_up_to_multiple(max(h, 4), multiple), round_up_to_multiple(max(w, 4), multiple)


def pad_to_multiple_reflect(x: jnp.ndarray, multiple: int = 64) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """Reflect-pad an NHWC batch up to the (H, W) bucket.

    Returns the padded batch and the original (h, w) for cropping the output.
    Reflect padding requires pad < dim; for tiny images fall back to edge mode.
    """
    _, h, w, _ = x.shape
    ph, pw = bucket_hw(h, w, multiple)
    dh, dw = ph - h, pw - w
    if dh == 0 and dw == 0:
        return x, (h, w)
    mode = "reflect" if (dh < h and dw < w) else "edge"
    x = jnp.pad(x, ((0, 0), (0, dh), (0, dw), (0, 0)), mode=mode)
    return x, (h, w)
