"""Pallas TPU kernels: fused instance norm + affine (+ optional ReLU), fwd+bwd.

Instance norm is the stylizer's most HBM-bound op. The b20 bf16 train-step
trace (round 2) shows XLA lowering it as separate stat-reduce fusions
(~0.7 ms per 42 MB res-block activation — ~60 GB/s, far under HBM bandwidth)
plus apply/backward loop fusions: ~10 ms/step across the network's 14 INs.
These kernels do each pass out of VMEM:

- forward: one HBM read of the slab, stats + normalize + affine + ReLU on the
  VPU, one HBM write — and emit (mean, inv) as residuals so the backward
  never recomputes statistics;
- backward: one read of (x, g), the two gradient reductions and the dx
  elementwise chain in VMEM, one write of dx, per-sample dgamma/dbeta rows
  (summed over batch outside, where it is a (N, C) -> (C,) triviality).

Grid is (N, C/Cb): instance-norm statistics are per-(sample, channel), so the
channel dim splits freely — keeping every block <= ~2 MB so double-buffered
in/out slabs and f32 temporaries fit VMEM at any batch size. Callers gate on
``fits_vmem`` and fall back to the XLA path for oversized slabs (e.g. the
256^2x32 decoder IN, whose channel dim cannot split).

Matches PyTorch InstanceNorm2d(affine=True) numerics: biased variance,
eps=1e-5, f32 statistics (reference /root/reference/models/model.py:29-44).
The ReLU is fused by gating the backward cotangent on the pre-ReLU sign
(reconstructed from xhat — no need to save y).

Measurements (see DESIGN.md §3/§8): at batch-1 inference the XLA path is
faster (1.65 vs 2.99 ms whole-forward) because XLA fuses IN into the conv
epilogue; the round-2 in-context A/B at batch-20 training also favored XLA
(89.2 -> 90.9 ms with this kernel wired in) — the pallas_call boundary
re-buys the co-fused elementwise work plus layout copies. So
``instance_norm(method="auto")`` in ops/norm.py always resolves to XLA;
this kernel is an explicit ``method="pallas"`` opt-in.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Per-block slab budget: in + out slabs are double-buffered by the pipeline
# and the bwd kernel holds x, g and dx plus f32 temporaries. 2 MB blocks
# OOM'd VMEM by 2 KB in the bwd kernel on v5e (x+g+dx double-buffered + f32
# temps = 16 MB); 1 MB leaves headroom.
_VMEM_SLAB_LIMIT_BYTES = 1024 * 1024


def _block_channels(c: int) -> int:
    """Channel-block size: split multiples of 128 onto the lane width."""
    return 128 if c % 128 == 0 else c


def fits_vmem(h: int, w: int, c: int, itemsize: int = 2) -> bool:
    return h * w * _block_channels(c) * itemsize <= _VMEM_SLAB_LIMIT_BYTES


def _in_fwd_kernel(x_ref, gamma_ref, beta_ref, y_ref, mean_ref, inv_ref,
                   *, eps: float, relu: bool):
    x = x_ref[0]  # (H, W, Cb), stays in its storage dtype
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
    mean_ref[0, 0] = mean[0, 0]
    inv_ref[0, 0] = inv[0, 0]


def _pallas_in_forward(x, gamma, beta, *, eps, relu, interpret=False):
    n, h, w, c = x.shape
    cb = _block_channels(c)
    kernel = functools.partial(_in_fwd_kernel, eps=eps, relu=relu)
    slab = lambda i, j: (i, 0, 0, j)
    row = lambda i, j: (i, 0, j)
    return pl.pallas_call(
        kernel,
        grid=(n, c // cb),
        in_specs=[
            pl.BlockSpec((1, h, w, cb), slab, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cb), lambda i, j: (0, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cb), lambda i, j: (0, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, h, w, cb), slab, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cb), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cb), row, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=10 * n * h * w * c,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=n * c,
        ),
    )(x, gamma.reshape(1, 1, c), beta.reshape(1, 1, c))


def _in_bwd_kernel(x_ref, g_ref, mean_ref, inv_ref, gamma_ref, beta_ref,
                   dx_ref, dgn_ref, dbn_ref, *, relu: bool):
    """Per-(sample, channel-block) IN backward, stats from fwd residuals.

    With xhat = (x - mean) * inv:
      dx     = gamma * inv * (g - mean(g) - xhat * mean(g * xhat))
      dgamma = sum_hw(g * xhat)   (per sample; summed over N by the caller)
      dbeta  = sum_hw(g)
    The fused-ReLU mask is y > 0 <=> xhat * gamma + beta > 0 — reconstructed
    instead of saving y.
    """
    x = x_ref[0]
    g = g_ref[0].astype(jnp.float32)
    hw = x.shape[0] * x.shape[1]
    mean = mean_ref[0, 0][None, None, :]
    inv = inv_ref[0, 0][None, None, :]
    gamma = gamma_ref[0, 0].astype(jnp.float32)[None, None, :]
    xhat = (x.astype(jnp.float32) - mean) * inv
    if relu:
        beta = beta_ref[0, 0].astype(jnp.float32)[None, None, :]
        g = jnp.where(xhat * gamma + beta > 0, g, 0.0)
    g_sum = jnp.sum(g, axis=(0, 1), keepdims=True)
    gx_sum = jnp.sum(g * xhat, axis=(0, 1), keepdims=True)
    dx = (gamma * inv) * (g - g_sum / hw - xhat * (gx_sum / hw))
    dx_ref[0] = dx.astype(dx_ref.dtype)
    dgn_ref[0, 0] = gx_sum[0, 0]
    dbn_ref[0, 0] = g_sum[0, 0]


def _pallas_in_backward(x, g, mean, inv, gamma, beta, *, relu, interpret=False):
    n, h, w, c = x.shape
    cb = _block_channels(c)
    kernel = functools.partial(_in_bwd_kernel, relu=relu)
    slab = lambda i, j: (i, 0, 0, j)
    row = lambda i, j: (i, 0, j)
    vec = lambda i, j: (0, 0, j)
    return pl.pallas_call(
        kernel,
        grid=(n, c // cb),
        in_specs=[
            pl.BlockSpec((1, h, w, cb), slab, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, cb), slab, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cb), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cb), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cb), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cb), vec, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, h, w, cb), slab, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cb), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cb), row, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=16 * n * h * w * c,
            bytes_accessed=3 * x.size * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, g, mean, inv, gamma.reshape(1, 1, c), beta.reshape(1, 1, c))


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
    y, _, _ = _pallas_in_forward(x, gamma, beta, eps=eps, relu=relu,
                                 interpret=interpret)
    return y


def _fused_in_fwd(x, gamma, beta, eps, relu, interpret):
    y, mean, inv = _pallas_in_forward(x, gamma, beta, eps=eps, relu=relu,
                                      interpret=interpret)
    return y, (x, gamma, beta, mean, inv)


def _fused_in_bwd(eps, relu, interpret, res, g):
    x, gamma, beta, mean, inv = res
    dx, dgn, dbn = _pallas_in_backward(
        x, g.astype(x.dtype), mean, inv, gamma, beta,
        relu=relu, interpret=interpret,
    )
    return (
        dx,
        jnp.sum(dgn, axis=(0, 1)).astype(gamma.dtype),
        jnp.sum(dbn, axis=(0, 1)).astype(beta.dtype),
    )


fused_instance_norm.defvjp(_fused_in_fwd, _fused_in_bwd)
