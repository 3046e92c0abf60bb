"""ctypes bindings for the native host-pipeline kernels (fnst_host.cpp).

The shared library is compiled on first use with the system g++ (cached next
to the source; rebuilt when the source is newer). Every entry point has a
NumPy fallback so the framework works on hosts without a toolchain — callers
use :func:`normalize_batch` / :func:`resize_bilinear` and never care which
implementation ran. ``available()`` reports whether the native path is live.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fnst_host.cpp")
_LIB = os.path.join(_DIR, "libfnst_host.so")

from fast_neural_style_transfer_tpu.utils.image_io import IMAGENET_MEAN, IMAGENET_STD

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_IMAGENET_MEAN = np.ascontiguousarray(IMAGENET_MEAN, np.float32)
_IMAGENET_STDINV = np.ascontiguousarray(1.0 / IMAGENET_STD, np.float32)


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-o", _LIB, _SRC, "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        needs_build = (
            not os.path.exists(_LIB)
            or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        )
        if needs_build and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB)
            lib.fnst_abi_version.restype = ctypes.c_int
            if lib.fnst_abi_version() != 1:
                return None
            lib.fnst_normalize_u8_to_f32.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
            ]
            lib.fnst_resize_bilinear_u8.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
            ]
            _lib = lib
        except (OSError, AttributeError):
            # OSError: unloadable .so; AttributeError: a stale/foreign
            # library missing the ABI symbol — both mean "use the fallback"
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def normalize_batch(u8: np.ndarray, *, n_threads: int = 4) -> np.ndarray:
    """(n, h, w, 3) uint8 -> ImageNet-normalized float32, native when possible."""
    assert u8.dtype == np.uint8 and u8.ndim == 4 and u8.shape[-1] == 3
    lib = _load()
    if lib is None:
        x = u8.astype(np.float32) / 255.0
        return (x - _IMAGENET_MEAN) * _IMAGENET_STDINV
    u8 = np.ascontiguousarray(u8)
    out = np.empty(u8.shape, np.float32)
    n, h, w, _ = u8.shape
    lib.fnst_normalize_u8_to_f32(
        u8.ctypes.data, out.ctypes.data, n, h, w,
        _IMAGENET_MEAN.ctypes.data, _IMAGENET_STDINV.ctypes.data, n_threads,
    )
    return out


def resize_bilinear(img: np.ndarray, dh: int, dw: int, *, n_threads: int = 1) -> np.ndarray:
    """(h, w, 3) uint8 -> (dh, dw, 3) uint8 bilinear (half-pixel centers).

    The native kernel is a fixed 2-tap bilinear, which matches PIL only when
    enlarging; PIL's BILINEAR widens its filter support on reduction
    (antialiasing), so DOWNSCALES always take the PIL path — otherwise the
    two implementations would diverge by tens of gray levels on photos and
    results would depend on whether a host has a C++ toolchain."""
    assert img.dtype == np.uint8 and img.ndim == 3 and img.shape[-1] == 3
    sh, sw, _ = img.shape
    if (sh, sw) == (dh, dw):
        return img
    lib = None if (dh < sh or dw < sw) else _load()
    if lib is None:
        from PIL import Image

        return np.asarray(
            Image.fromarray(img).resize((dw, dh), Image.BILINEAR), np.uint8
        )
    img = np.ascontiguousarray(img)
    out = np.empty((dh, dw, 3), np.uint8)
    lib.fnst_resize_bilinear_u8(img.ctypes.data, sh, sw, out.ctypes.data, dh, dw, n_threads)
    return out
