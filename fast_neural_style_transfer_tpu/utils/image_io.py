"""Canonical image IO + preprocessing (fixes reference defect #7).

The reference uses *three different* preprocessing pipelines: training
normalizes with ImageNet stats (/root/reference/train.py:92-102), eager
inference feeds raw [0,1] but still de-normalizes the output
(/root/reference/inference.py:28-31,52-57), and ONNX inference normalizes
(/root/reference/onnx_version/onnx_inference.py:11-15). This module is the
single preprocess used everywhere in the rebuild:

    uint8 HWC RGB  --/255-->  [0,1]  --(x-mean)/std-->  network space
    network space  --x*std+mean-->  clamp [0,1]  --*255-->  uint8

All arrays are NHWC float32 on the host; device placement/dtype is the
caller's business.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def decode_image(path: str) -> np.ndarray:
    """Decode an image file to uint8 HWC RGB (PIL host-side, like the
    reference's data/dataset.py:22-26)."""
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), np.uint8)


def resize_image(img: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """Bilinear resize uint8 HWC to (h, w) — matches torchvision
    transforms.Resize((256, 256)) with PIL bilinear (train.py:94)."""
    from PIL import Image

    h, w = size
    if img.shape[:2] == (h, w):
        return img
    return np.asarray(
        Image.fromarray(img).resize((w, h), Image.BILINEAR), np.uint8
    )


def normalize_image(img_u8: np.ndarray) -> np.ndarray:
    """uint8 HWC/NHWC -> ImageNet-normalized float32 (the network's space)."""
    x = img_u8.astype(np.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def u8_to_network_jnp(x_u8):
    """On-device uint8 -> network space (/255 + ImageNet normalize); the
    H2D leg of the uint8 transport path (both jitted roundtrips use this so
    the convention can never diverge between model families)."""
    import jax.numpy as jnp

    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return (x_u8.astype(jnp.float32) / 255.0 - mean) / std


def network_to_u8_jnp(y):
    """On-device network space -> uint8 (de-normalize, clip, round); the
    D2H leg of the uint8 transport path."""
    import jax.numpy as jnp

    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    y = jnp.clip(y * std + mean, 0.0, 1.0)
    return (y * 255.0 + 0.5).astype(jnp.uint8)


def denormalize_image(x: np.ndarray) -> np.ndarray:
    """Network space -> float32 [0,1] (de-normalize + clamp, matching
    train.py:254-257 / inference.py:52-57)."""
    x = np.asarray(x, np.float32) * IMAGENET_STD + IMAGENET_MEAN
    return np.clip(x, 0.0, 1.0)


def load_image(
    path: str,
    size: Optional[Tuple[int, int]] = None,
    *,
    normalize: bool = True,
    batch: bool = True,
) -> np.ndarray:
    """Decode + optional resize + canonical normalize; returns NHWC float32."""
    img = decode_image(path)
    if size is not None:
        img = resize_image(img, size)
    x = normalize_image(img) if normalize else img.astype(np.float32) / 255.0
    return x[None] if batch else x


def save_image(x: np.ndarray, path: str, *, denormalize: bool = True) -> None:
    """Save a (1,H,W,C) or (H,W,C) network-space or [0,1] image as a file."""
    from PIL import Image

    x = np.asarray(x)
    if x.ndim == 4:
        x = x[0]
    x = denormalize_image(x) if denormalize else np.clip(x, 0.0, 1.0)
    Image.fromarray((x * 255.0 + 0.5).astype(np.uint8)).save(path)
