"""Pallas TPU kernel: full backward of a stride-1 SAME conv with tiny C_in.

The b20 bf16 train-step trace (round 2, DESIGN.md §8) shows XLA lowering
d(out)/d(x) of VGG conv1_1 — a k3 64->3 "conv" over the (20,256,256,64)
cotangent — as one 5.97 ms fusion: 3 of 128 MXU lanes used, and the
layout XLA picks streams the 168 MB cotangent far below HBM bandwidth.
The op's traffic floor (read g once, write the 8 MB dx once) is ~0.25 ms.

Two XLA-level reformulations already failed (DESIGN.md §8): s2d phase
rearrangement (`smallc_s2d`) and tap-packing with XLA-level shifted adds
(`tappack`) — both because any multi-op HLO form materializes the big
intermediate in HBM. This kernel is the tap-packed form with the
intermediate kept in VMEM:

    P[r, c, (u,v,i)] = sum_o g[r, c, o] * w[k-1-u, k-1-v, i, o]
    dx[h, w, i]      = sum_{u,v} P[h+u-p, w+v-p, (u,v,i)]

Design rules, each bought by an on-chip measurement:

1. **Planar compute.** P is produced TRANSPOSED — (k*k*ci, pixels) — so
   the per-tap shifted adds run on (TH, W) planes with W on the lanes.
   A (TH, W, ci) slab form pads ci<=4 lanes to 128 (4.7x VPU tax):
   3.63 ms/call vs 1.2 ms planar. dx leaves the kernel NCHW; NHWC is an
   8 MB XLA transpose outside.
2. **g is passed exactly once**, halo rows from VMEM scratch persisted
   across the sequential grid: at step i the kernel computes tile i-1
   from (tail of tile i-2, tile i-1, head of tile i) — a one-tile
   software skew, grid (N, H/TH + 1). A version passing g three times
   (center + clamped halo BlockSpecs) made XLA duplicate the
   relu-backward producer fusions around the call.
3. **No manual HBM DMA of g.** Mosaic requires 128-lane alignment for
   async copies; g's minor dim is C_out=64. Blocked specs don't care.

VERDICT AFTER FOUR IN-CONTEXT VARIANTS — a documented dead end, shipped
as an opt-in (``conv2d_same(lowering="pallas_dx")``), NOT in "auto". The
kernel beats XLA's op 5x in isolation (5.97 -> 1.2 ms, dx bit-exact
on-chip), but every wiring of it into the b20 train step lost to the
88.1 ms XLA baseline:

  - 3-operand halo-spec dx:         94.2 ms (producer fusions duplicated)
  - single-operand skewed dx:       94.2 ms (g materialized twice: the
    custom call's forced default layout + the pixel-major form XLA's own
    dw/db fusions want)
  - + dw/db absorbed in-kernel:    113.6 ms (the custom call becomes g's
    only consumer, but the in-kernel dw plane-stacking relayouts cost
    more than the duplication they remove)

XLA's backward for this seam is layout-entangled end-to-end (pixel-major
(n,c)-tiled layouts chosen jointly across relu/pool/conv fusions); a
custom call here forces default layouts at the boundary and XLA pays
more re-materializing around it than the op win. The isolated kernel is
kept because the balance can flip with future Mosaic layout support
(non-default custom-call layouts would void the boundary tax).

Reference semantics anchored by tests against XLA's own conv gradients
(tests/test_ops.py, dx bit-exact on-chip); the forward this backs is the
PyTorch ``padding=k//2`` conv of /root/reference/models/vgg19_net.py:29-44.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Row-tile height. Measured flat across 8/16/32 on v5e (1.20/1.21/1.19 ms
# at b20 256^2x64 bf16, dx-only form); 16 keeps the kernel usable down to
# 32-row spatial shards (h >= 2*TILE_H).
_TILE_H = 16


def _shifted_plane(plane, u, v, th, w, p, col):
    """(TH, W) cut of a (rows, W) plane shifted by tap (u, v): rows
    [u, u+TH), columns rolled by p-v with wrapped lanes zeroed."""
    sl = plane[u:u + th, :]
    s = p - v  # out[:, x] = src[:, x + v - p]; roll shift must be >= 0
    if s > 0:
        return jnp.where(col >= s, pltpu.roll(sl, s, 1), 0.0)
    if s < 0:
        return jnp.where(col < w + s, pltpu.roll(sl, w + s, 1), 0.0)
    return sl


def _bwd_kernel(gc_ref, xc_ref, wp_ref, dx_ref, dwb_ref,
                gprev_ref, gtail_ref, xprev_ref, xtail_ref, acc_ref,
                *, k: int, ci: int, tile_h: int):
    """Skewed grid (n, nh+1): step i emits dx rows of tile i-1 and folds
    tile i-1's dw/db contributions into the f32 accumulator."""
    n = pl.program_id(0)
    i = pl.program_id(1)
    nn = pl.num_programs(0)
    nh = pl.num_programs(1) - 1
    p = k // 2
    th = tile_h
    _, _, w, co = gc_ref.shape
    rows = th + 2 * p
    npk = k * k * ci

    @pl.when(jnp.logical_and(n == 0, i == 0))
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(i > 0)
    def _():
        # Halo above tile i-1 (zeros at the image top), the tile itself,
        # halo below (head of the current block; zeros at the bottom,
        # where the clamped index map re-reads tile nh-1).
        g_top = jnp.where(i == 1, 0, gtail_ref[:].reshape(p * w, co))
        g_bot = jnp.where(i == nh, 0, gc_ref[0, :p].reshape(p * w, co))
        gflat = jnp.concatenate(
            [g_top, gprev_ref[:].reshape(th * w, co), g_bot], axis=0)

        # ---- dx ----
        # MXU: tap-packed 1x1 "conv", transposed output, f32 accumulation.
        # Contract g's minor (channel) dim directly: (npk, co) x
        # (rows*w, co) -> (npk, rows*w); only the small P changes layout.
        pk_t = jax.lax.dot_general(
            wp_ref[:], gflat, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        p3 = pk_t.reshape(npk, rows, w)

        # VPU: k*k statically shifted adds per input channel, on (TH, W)
        # planes. Column shift = circular lane roll + mask of the wrapped
        # columns (Mosaic has no pad-of-slice lowering; roll+mask stays
        # elementwise).
        col = jax.lax.broadcasted_iota(jnp.int32, (th, w), 1)
        for c in range(ci):
            acc = jnp.zeros((th, w), jnp.float32)
            for u in range(k):
                for v in range(k):
                    acc = acc + _shifted_plane(
                        p3[(u * k + v) * ci + c], u, v, th, w, p, col)
            dx_ref[0, c] = acc.astype(dx_ref.dtype)

        # ---- dw ----
        # dw[u,v,i,o] += sum_{h,w} x[h+u-p, w+v-p, i] * g[h, w, o]:
        # build the 27 shifted x planes (x is tiny: ci<=4), one matmul
        # against the g tile, accumulate f32.
        x_top = jnp.where(i == 1, 0, xtail_ref[:])
        x_bot = jnp.where(i == nh, 0, xc_ref[0, :p])
        xfull = jnp.concatenate([x_top, xprev_ref[:], x_bot], axis=0)
        planes = []
        for u in range(k):
            for v in range(k):
                for c in range(ci):
                    # f32: Mosaic's lane rotate is 32-bit only, and the
                    # planes are tiny.
                    planes.append(_shifted_plane(
                        xfull[:, :, c].astype(jnp.float32),
                        u, v, th, w, p, col))
        a3 = jnp.stack(planes).reshape(npk, th * w)
        dw_part = jax.lax.dot_general(
            a3.astype(gflat.dtype), gprev_ref[:].reshape(th * w, co),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # ---- db ----
        db_part = jnp.sum(
            gprev_ref[:].reshape(th * w, co).astype(jnp.float32), axis=0,
            keepdims=True)
        acc_ref[:] = acc_ref[:] + jnp.concatenate([dw_part, db_part], axis=0)

    @pl.when(jnp.logical_and(n == nn - 1, i == nh))
    def _():
        dwb_ref[:] = acc_ref[:]

    # Advance the skew: tile i-1's tail, then tile i, into scratch.
    gtail_ref[:] = gprev_ref[pl.ds(th - p, p)]
    gprev_ref[:] = gc_ref[0]
    xtail_ref[:] = xprev_ref[pl.ds(th - p, p)]
    xprev_ref[:] = xc_ref[0]


def supported(g_shape, w_shape) -> bool:
    """Shapes this kernel handles: odd k, tiny C_in (packed matmul fits one
    lane block), halo within one neighboring tile, H a multiple of the row
    tile, lane-aligned W."""
    k, k2, ci, co = w_shape
    _, h, w, _ = g_shape
    return (
        k == k2
        and k % 2 == 1
        and k >= 3
        and k * k * ci <= 128
        and _TILE_H % (k // 2) == 0
        and k // 2 < _TILE_H
        and h % _TILE_H == 0
        and h >= 2 * _TILE_H
        and w % 128 == 0
        and co % 8 == 0
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv2d_same_bwd(g: jnp.ndarray, x: jnp.ndarray, w: jnp.ndarray, *,
                    interpret: bool = False):
    """Full backward of ``conv2d_same(x, w, b, stride=1)``.

    g: (N, H, W, C_out) cotangent of the conv output.
    x: (N, H, W, C_in) forward input (for dw).
    w: (k, k, C_in, C_out) HWIO kernel.
    Returns (dx (N,H,W,C_in) in g's dtype, dw (k,k,C_in,C_out) f32,
    db (C_out,) f32).
    """
    k, _, ci, co = w.shape
    n, h, wd, _ = g.shape
    if not supported(g.shape, w.shape):
        raise ValueError(f"unsupported shapes g={g.shape} w={w.shape}")
    p = k // 2
    th = _TILE_H
    nh = h // th
    npk = k * k * ci
    # wpack[(u*k+v)*ci + i, o] = w[k-1-u, k-1-v, i, o]
    wpack = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))  # (k,k,co,ci)
    wpack = jnp.transpose(wpack, (2, 0, 1, 3)).reshape(co, npk).T
    kernel = functools.partial(_bwd_kernel, k=k, ci=ci, tile_h=th)

    def center_map(n_, i_):
        return (n_, jnp.minimum(i_, nh - 1), 0, 0)

    dx_nchw, dwb = pl.pallas_call(
        kernel,
        grid=(n, nh + 1),
        in_specs=[
            pl.BlockSpec((1, th, wd, co), center_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, wd, ci), center_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, ci, th, wd),
                lambda n_, i_: (n_, 0, jnp.maximum(i_ - 1, 0), 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec((npk + 1, co), lambda n_, i_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, ci, h, wd), g.dtype),
            jax.ShapeDtypeStruct((npk + 1, co), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((th, wd, co), g.dtype),
            pltpu.VMEM((p, wd, co), g.dtype),
            pltpu.VMEM((th, wd, ci), x.dtype),
            pltpu.VMEM((p, wd, ci), x.dtype),
            pltpu.VMEM((npk + 1, co), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * n * h * wd * co * k * k * ci,
            bytes_accessed=g.size * g.dtype.itemsize
            + x.size * x.dtype.itemsize
            + n * h * wd * ci * g.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(g, x, wpack.astype(g.dtype))
    # Kernel emits planar NCHW dx (lane-efficient tap adds); back to NHWC
    # is an XLA copy of the small dx only (~8 MB at b20/256^2). dw rows
    # are tap-packed: row (u*k+v)*ci + i maps to w[u,v,i,o] directly.
    dx = jnp.transpose(dx_nchw, (0, 2, 3, 1))
    dw = dwb[:npk].reshape(k, k, ci, co)
    db = dwb[npk]
    return dx, dw, db


def conv2d_same_dx(g: jnp.ndarray, w: jnp.ndarray, *,
                   interpret: bool = False) -> jnp.ndarray:
    """dx only (see conv2d_same_bwd); x enters as zeros, dw/db discarded."""
    dx, _, _ = conv2d_same_bwd(
        g, jnp.zeros(g.shape[:3] + (w.shape[2],), g.dtype), w,
        interpret=interpret)
    return dx
