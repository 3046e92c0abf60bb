"""Instance normalization (NHWC) with affine parameters.

Matches PyTorch ``nn.InstanceNorm2d(C, affine=True)`` (reference
/root/reference/models/model.py:29-44,80-83): per-(sample, channel) mean and
*biased* variance over the spatial dims, eps=1e-5, then learned scale/shift.

Statistics are always computed in float32 regardless of the activation dtype —
IN is a full-spatial reduction and bf16 accumulation visibly degrades
stylization quality.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def instance_norm(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    *,
    eps: float = 1e-5,
) -> jnp.ndarray:
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    # biased variance, computed stably around the mean
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
    inv = lax.rsqrt(var + eps)
    out = (xf - mean) * inv
    out = out * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return out.astype(orig_dtype)
