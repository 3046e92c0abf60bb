"""Native host-kernel tests: build, correctness vs NumPy/PIL, fallbacks."""

import numpy as np
import pytest
from PIL import Image

from fast_neural_style_transfer_tpu import native
from fast_neural_style_transfer_tpu.utils.image_io import IMAGENET_MEAN, IMAGENET_STD


def test_native_library_builds_and_loads():
    # the toolchain is present in this environment, so the native path must be live
    assert native.available()


def test_normalize_batch_matches_numpy(rng):
    u8 = rng.integers(0, 256, (3, 17, 23, 3), dtype=np.uint8)
    got = native.normalize_batch(u8)
    want = (u8.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    assert got.dtype == np.float32


def test_normalize_batch_multithreaded_same_result(rng):
    u8 = rng.integers(0, 256, (4, 128, 96, 3), dtype=np.uint8)
    a = native.normalize_batch(u8, n_threads=1)
    b = native.normalize_batch(u8, n_threads=8)
    np.testing.assert_array_equal(a, b)


def test_resize_bilinear_close_to_pil(rng):
    img = rng.integers(0, 256, (97, 61, 3), dtype=np.uint8)
    got = native.resize_bilinear(img, 256, 256)
    want = np.asarray(Image.fromarray(img).resize((256, 256), Image.BILINEAR))
    assert got.shape == want.shape == (256, 256, 3)
    # PIL uses fixed-point arithmetic; allow small per-pixel differences
    diff = np.abs(got.astype(np.int16) - want.astype(np.int16))
    assert np.mean(diff) < 1.0 and np.percentile(diff, 99) <= 2


def test_resize_identity_shortcut(rng):
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    out = native.resize_bilinear(img, 32, 32)
    np.testing.assert_array_equal(out, img)


def test_resize_downscale_matches_pil_exactly(rng):
    """Downscales must take the PIL path even when the native library is
    available: the 2-tap native kernel aliases on reduction (measured mean
    diff ~25/255 on a 4x downscale of noise) while PIL widens its filter
    support — results must not depend on whether a host has a toolchain."""
    img = rng.integers(0, 256, (512, 512, 3), dtype=np.uint8)
    got = native.resize_bilinear(img, 128, 128)
    want = np.asarray(Image.fromarray(img).resize((128, 128), Image.BILINEAR))
    np.testing.assert_array_equal(got, want)
