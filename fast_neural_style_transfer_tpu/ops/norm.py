"""Instance normalization (NHWC) with affine parameters, optional fused ReLU.

Matches PyTorch ``nn.InstanceNorm2d(C, affine=True)`` (reference
/root/reference/models/model.py:29-44,80-83): per-(sample, channel) mean and
*biased* variance over the spatial dims, eps=1e-5, then learned scale/shift.
Statistics are always computed in float32 regardless of activation dtype.

Two lowerings behind one API:
- ``method="xla"``: jnp reductions — XLA fuses the reduce + normalize + ReLU
  INTO the producing conv's epilogue, and handles any activation size;
- ``method="pallas"``: the VMEM-resident kernel in ``pallas_norm.py``.

Measured on a v5e chip (bf16 stylizer forward, 256x256): XLA 1.65 ms vs
Pallas 2.99 ms — the custom kernel *breaks* XLA's conv-epilogue fusion and
pays extra HBM round trips at the pallas_call boundary, so ``"auto"``
resolves to XLA. The kernel stays available as an explicit opt-in (and as
the template for ops XLA can't fuse).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _affine_f32(p, x_ndim):
    """(C,) or (B, C) affine -> broadcastable against (B, H, W, C)."""
    p = p.astype(jnp.float32)
    if p.ndim == 2:  # per-example (conditional IN): (B, C) -> (B, 1, 1, C)
        return p[:, None, None, :]
    return p


def instance_norm_stats(x, method: str = "stable"):
    """Per-(sample, channel) spatial moments of a (B, H, W, C) activation:
    float32 ``(mean, var)`` each shaped (B, 1, 1, C). These are exactly the
    statistics ``instance_norm`` normalizes with — exposed so callers can
    capture them from one input and re-apply them to another
    (frozen-statistics temporal stabilization for video, infer/video.py).

    ``method``:
    - "stable" (default): biased variance computed around the mean. Two
      dependent reductions — the var pass re-reads the activation after the
      mean is known.
    - "onepass": var = E[x²] - mean². mean and E[x²] share one read of the
      activation (XLA multi-output reduce fusion), halving stat-pass HBM
      traffic — the round-2 hunt measured the stat reduces as HBM-bound
      (DESIGN.md §8). Loses precision when mean² >> var; the capture/inject
      stabilization path therefore always uses "stable" (bit-identity
      contract with the plain forward).
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    if method == "onepass":
        sq = jnp.mean(jnp.square(xf), axis=(1, 2), keepdims=True)
        var = jnp.maximum(sq - jnp.square(mean), 0.0)
    else:
        var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
    return mean, var


def apply_instance_norm_stats(x, mean, var, gamma, beta, *,
                              eps: float = 1e-5, relu: bool = False):
    """Normalize ``x`` with externally supplied moments (broadcastable
    against (B, H, W, C), e.g. a reference frame's (1, 1, 1, C) stats) and
    the learned affine. With ``instance_norm_stats(x)`` this composes to
    exactly ``instance_norm(x, ...)``."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    inv = lax.rsqrt(var.astype(jnp.float32) + eps)
    out = (xf - mean.astype(jnp.float32)) * inv
    out = out * _affine_f32(gamma, xf.ndim) + _affine_f32(beta, xf.ndim)
    if relu:
        out = jnp.maximum(out, 0.0)
    return out.astype(orig_dtype)


def _xla_instance_norm(x, gamma, beta, *, eps: float, relu: bool,
                       stats_method: str = "stable"):
    mean, var = instance_norm_stats(x, method=stats_method)
    return apply_instance_norm_stats(x, mean, var, gamma, beta,
                                     eps=eps, relu=relu)


def instance_norm(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    *,
    eps: float = 1e-5,
    relu: bool = False,
    method: str = "auto",
) -> jnp.ndarray:
    if method not in ("auto", "xla", "onepass", "pallas"):
        raise ValueError(f"unknown instance_norm method {method!r}")
    if method == "onepass":
        # one-HBM-pass statistics (see instance_norm_stats): measured
        # -2.1% b20 / -3.3% b96 train-step time on v5e
        # (evidence/in_onepass_r5.jsonl, tools/probe_in_onepass.py)
        return _xla_instance_norm(x, gamma, beta, eps=eps, relu=relu,
                                  stats_method="onepass")
    if method == "pallas" and gamma.ndim == 1:
        # (the Pallas kernel takes per-channel (C,) affines only; per-example
        # (B, C) conditional-IN affines go through the XLA path)
        from fast_neural_style_transfer_tpu.ops.pallas_norm import (
            fits_vmem,
            fused_instance_norm,
        )

        n, h, w, c = x.shape
        if fits_vmem(h, w, c, x.dtype.itemsize):
            # interpret mode lets the Pallas path run (and be tested) on CPU
            on_tpu = jax.default_backend() == "tpu"
            return fused_instance_norm(x, gamma, beta, eps, relu, not on_tpu)
    return _xla_instance_norm(x, gamma, beta, eps=eps, relu=relu)
