"""Pallas TPU kernel: fused instance norm + affine (+ optional ReLU).

Instance norm is the stylizer's most HBM-bound op: XLA lowers it as a
reduce (read x), then a normalize/affine elementwise (read x again, write y),
and fuses the following ReLU separately per layer. This kernel does the
two passes entirely out of VMEM — one HBM read of the (H, W, C) slab per
sample, stats + normalize + affine + ReLU on the VPU, one HBM write — and is
exposed through the same ``instance_norm`` signature (ops/norm.py) with a
custom VJP so it trains.

Layout: NHWC with the channel dim on lanes (C is a multiple of 32 for every
stylizer layer except the 3-channel output, which never hits IN). Grid is
(N,) — one program per sample, whole spatial slab in VMEM; callers gate on
``fits_vmem`` and fall back to the XLA path for oversized activations
(large-image inference).

Matches PyTorch InstanceNorm2d(affine=True) numerics: biased variance,
eps=1e-5, f32 statistics (reference /root/reference/models/model.py:29-44).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM is ~16 MB/core; the in + out slabs are double-buffered by the
# pipeline, so keep each slab small enough that 4 copies + temporaries fit.
_VMEM_SLAB_LIMIT_BYTES = 2 * 1024 * 1024


def fits_vmem(h: int, w: int, c: int, itemsize: int = 2) -> bool:
    return h * w * c * itemsize <= _VMEM_SLAB_LIMIT_BYTES


def _in_fwd_kernel(x_ref, gamma_ref, beta_ref, y_ref, *, eps: float, relu: bool):
    x = x_ref[0]  # (H, W, C), stays in its storage dtype
    hw = x.shape[0] * x.shape[1]
    # f32 accumulation WITHOUT materializing an f32 copy of the slab:
    # mean from a dtype-widening sum, variance via E[x^2] - mean^2.
    s1 = jnp.sum(x, axis=(0, 1), keepdims=True, dtype=jnp.float32)
    s2 = jnp.sum(x * x, axis=(0, 1), keepdims=True, dtype=jnp.float32)
    mean = s1 / hw
    var = jnp.maximum(s2 / hw - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    scale = inv * gamma_ref[0, 0].astype(jnp.float32)
    shift = beta_ref[0, 0].astype(jnp.float32) - mean * scale
    y = x.astype(jnp.float32) * scale + shift  # fused elementwise chain
    if relu:
        y = jnp.maximum(y, 0.0)
    y_ref[0] = y.astype(y_ref.dtype)


def _pallas_in_forward(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    *,
    eps: float,
    relu: bool,
    interpret: bool = False,
) -> jnp.ndarray:
    n, h, w, c = x.shape
    kernel = functools.partial(_in_fwd_kernel, eps=eps, relu=relu)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=10 * n * h * w * c,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=n * c,
        ),
    )(x, gamma.reshape(1, 1, c), beta.reshape(1, 1, c))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_instance_norm(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    eps: float = 1e-5,
    relu: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused IN(+ReLU), differentiable; NHWC in/out, f32 stats."""
    return _pallas_in_forward(x, gamma, beta, eps=eps, relu=relu, interpret=interpret)


def _fused_in_fwd(x, gamma, beta, eps, relu, interpret):
    y = _pallas_in_forward(x, gamma, beta, eps=eps, relu=relu, interpret=interpret)
    return y, (x, gamma, y)


def _fused_in_bwd(eps, relu, interpret, res, g):
    """Standard IN backward (XLA; the matmul-free math fuses well already).

    With xhat=(x-mu)*inv: dx = gamma*inv * (g - mean(g) - xhat*mean(g*xhat)),
    dgamma = sum_nhw(g*xhat), dbeta = sum_nhw(g). For the fused ReLU, the
    output y>0 mask gates the incoming cotangent first.
    """
    x, gamma, y = res
    xf = x.astype(jnp.float32)
    g = g.astype(jnp.float32)
    if relu:
        g = jnp.where(y > 0, g, 0.0)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=(1, 2), keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = xc * inv
    g_mean = jnp.mean(g, axis=(1, 2), keepdims=True)
    gx_mean = jnp.mean(g * xhat, axis=(1, 2), keepdims=True)
    dx = gamma.astype(jnp.float32) * inv * (g - g_mean - xhat * gx_mean)
    dgamma = jnp.sum(g * xhat, axis=(0, 1, 2))
    dbeta = jnp.sum(g, axis=(0, 1, 2))
    return (
        dx.astype(x.dtype),
        dgamma.astype(gamma.dtype),
        dbeta.astype(gamma.dtype),
    )


fused_instance_norm.defvjp(_fused_in_fwd, _fused_in_bwd)
