"""Johnson-style feed-forward stylizer (TransformerNet), TPU-native.

Architecture reproduced from the reference StyleTransferNet
(/root/reference/models/model.py:24-90), NOT its module tree: here the model is
a pure function over an explicit parameter pytree so the whole forward (and the
train step around it) jits into one XLA program.

    encoder:  ReflectConv 3->64   k9 s2 | IN | ReLU      (model.py:28-29,51)
              ReflectConv 64->256 k3 s2 | IN | ReLU      (model.py:31-32,52)
    body:     5 x ResidualBlock(256):
                ReflectConv k3 | IN | ReLU | Dropout2d(0.1) |
                ReflectConv k3 | IN | + identity          (model.py:77-90)
    decoder:  ConvTranspose 256->64 k3 s2 p1 op1 | IN | ReLU  (model.py:40-41,60)
              ConvTranspose 64->32  k3 s2 p1 op1 | IN | ReLU  (model.py:43-44,61)
              ReflectConv 32->3 k9 s1, NO activation      (model.py:47,64)

The final layer has no tanh despite the reference README's claim (defect #6 in
SURVEY.md §2.3); the network emits ImageNet-normalized RGB, clamped to [-3, 3]
during training by the train step (train.py:174), de-normalized at inference.

Dropout2d zeroes whole channels per sample with p=0.1 and rescales by 1/(1-p),
matching torch. ``apply(..., train=False)`` (or rng=None) disables it, matching
``model.eval()`` around monitor sampling (train.py:242-266).

Initialization matches PyTorch defaults so training dynamics transfer:
Conv2d/ConvTranspose2d use Kaiming-uniform(a=sqrt(5)) == U(-L, L) with
L = 1/sqrt(fan_in * k * k), bias U(-L, L); InstanceNorm affine gamma=1, beta=0.

Multi-style (beyond the reference, which trains one net per style): with
``init(key, num_styles=S)`` every instance-norm affine becomes an (S, C)
bank — conditional instance norm, Dumoulin et al. 2017, "A Learned
Representation for Artistic Style". ``apply(..., style_weights=w)`` selects
(or convexly blends) rows: ``w`` is (S,) for a whole batch or (B, S) for
per-example styles (how training samples styles). The convs — 99.7% of the
parameters — are shared across styles. ``bake_style(params, w)`` collapses
an (S, C) bank into a standard single-style net, so every downstream path
(ONNX/TorchScript/.pth export, int8, spatial sharding) works on multi-style
checkpoints without knowing about them.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from fast_neural_style_transfer_tpu.core.dtypes import Precision
from fast_neural_style_transfer_tpu.ops import (
    conv_transpose2d,
    instance_norm,
    reflect_conv2d,
)

Params = Dict[str, Any]

NUM_RES_BLOCKS = 5
DROPOUT_RATE = 0.1


def _init_conv(key, k: int, cin: int, cout: int, *, transpose: bool = False):
    """PyTorch-default Kaiming-uniform init: U(-L, L) with L = 1/sqrt(fan_in).
    torch's _calculate_fan_in_and_fan_out takes fan_in from weight dim 1 times
    the receptive field, which for ConvTranspose2d's (in, out, kh, kw) layout
    is out_ch*k*k — hence the ``transpose`` switch."""
    wkey, bkey = jax.random.split(key)
    fan_in = (cout if transpose else cin) * k * k
    limit = 1.0 / math.sqrt(fan_in)
    # HWIO layout: (kh, kw, in, out)
    w = jax.random.uniform(wkey, (k, k, cin, cout), jnp.float32, -limit, limit)
    b = jax.random.uniform(bkey, (cout,), jnp.float32, -limit, limit)
    return {"w": w, "b": b}


def _init_in(c: int, num_styles: int = 1):
    """IN affine params: (C,) classic, (S, C) conditional bank for S > 1."""
    shape = (c,) if num_styles == 1 else (num_styles, c)
    return {"gamma": jnp.ones(shape, jnp.float32), "beta": jnp.zeros(shape, jnp.float32)}


def num_styles(params: Params) -> int:
    """1 for a classic single-style net, S for a conditional-IN bank."""
    g = params["norm1"]["gamma"]
    return int(g.shape[0]) if g.ndim == 2 else 1


def bake_style(params: Params, style_weights) -> Params:
    """Collapse a multi-style net into a standard single-style net.

    ``style_weights``: an int style index, or a length-S weight vector
    (blends styles — convex weights interpolate artistic styles, Dumoulin
    et al. §3.2). The result has (C,)-shaped IN affines and runs through
    every single-style code path (export, int8, spatial) unchanged.
    """
    import numpy as _np

    s = num_styles(params)
    if s == 1:
        raise ValueError("bake_style: params are already single-style")
    if isinstance(style_weights, bool):
        # bool passes isinstance(int) but .at[True] is MASK indexing, which
        # would silently bake the SUM of all styles — refuse it outright
        raise TypeError("style index must be an integer, not bool")
    if isinstance(style_weights, (int, _np.integer)):
        idx = int(style_weights)
        if not 0 <= idx < s:
            raise ValueError(f"style index {idx} out of range [0, {s})")
        w = jnp.zeros((s,), jnp.float32).at[idx].set(1.0)
    else:
        w = jnp.asarray(style_weights, jnp.float32)
        if w.shape != (s,):
            raise ValueError(
                f"style_weights shape {w.shape} != ({s},) for a {s}-style net"
            )
        wv = _np.asarray(w)
        if (wv < 0).any() or abs(float(wv.sum()) - 1.0) > 1e-3:
            # everything downstream (docs, CLI help, the training
            # distribution of the IN affines) assumes a convex blend; a
            # typo'd --style_blend 0.5 0.7 would otherwise ship scaled
            # affines into exports with no warning anywhere
            raise ValueError(
                f"style blend weights must be convex (>= 0, sum to 1); got "
                f"{wv.tolist()} with sum {float(wv.sum()):.4f}"
            )

    def bake(leaf):
        # only the IN banks are (S, C); conv weights are 4-D, biases (C,)
        if getattr(leaf, "ndim", 0) == 2 and leaf.shape[0] == s:
            return w @ leaf
        return leaf

    return jax.tree.map(bake, params)


def require_single_style(params: Params, what: str) -> None:
    """Guard for paths that only handle classic (C,)-affine nets (export
    writers, the reference .pth layout): fail with the fix, not a shape
    error deep inside."""
    s = num_styles(params)
    if s > 1:
        raise ValueError(
            f"{what} needs single-style params, but this net has {s} "
            "conditional-IN styles — bake_style(params, <index or blend>) "
            "first (the CLIs' --style_index/--style_blend do this)"
        )


class TransformerNet:
    """Pure-functional stylizer: ``init`` builds params, ``apply`` runs NHWC."""

    @staticmethod
    def init(key: jax.Array, num_styles: int = 1) -> Params:
        if num_styles < 1:
            raise ValueError(f"num_styles must be >= 1, got {num_styles}")
        keys = jax.random.split(key, 16)
        ns = num_styles
        params: Params = {
            "conv1": _init_conv(keys[0], 9, 3, 64),
            "norm1": _init_in(64, ns),
            "conv2": _init_conv(keys[1], 3, 64, 256),
            "norm2": _init_in(256, ns),
            "res_blocks": [],
            "up1": _init_conv(keys[2], 3, 256, 64, transpose=True),
            "norm3": _init_in(64, ns),
            "up2": _init_conv(keys[3], 3, 64, 32, transpose=True),
            "norm4": _init_in(32, ns),
            "final_conv": _init_conv(keys[4], 9, 32, 3),
        }
        for i in range(NUM_RES_BLOCKS):
            rk = jax.random.split(keys[5 + i])
            params["res_blocks"].append(
                {
                    "conv1": _init_conv(rk[0], 3, 256, 256),
                    "in1": _init_in(256, ns),
                    "conv2": _init_conv(rk[1], 3, 256, 256),
                    "in2": _init_in(256, ns),
                }
            )
        return params

    @staticmethod
    def apply(
        params: Params,
        x: jnp.ndarray,
        *,
        train: bool = False,
        rng: Optional[jax.Array] = None,
        precision: Precision = Precision.f32(),
        norm_method: str = "auto",
        style_weights: Optional[jnp.ndarray] = None,
        in_stats: Optional[list] = None,
        stats_blend: float = 1.0,
        return_stats: bool = False,
    ) -> jnp.ndarray:
        """NHWC forward. H and W must be multiples of 4 for exact round-trip.

        ``norm_method`` selects the instance-norm lowering. "auto" resolves
        to the XLA path (measured faster at these shapes — XLA fuses IN into
        the producing conv's epilogue); the fused Pallas IN+ReLU kernel is an
        explicit opt-in via ``norm_method="pallas"`` (ops/norm.py).

        ``style_weights`` (multi-style params only): (S,) weights applied to
        the whole batch, or (B, S) per-example rows. Selection is a tiny
        matmul against each (S, C) affine bank — jit-friendly, no gathers.

        Frozen-statistics temporal stabilization (infer/video.py): IN's
        per-frame moments are the stylizer's main flicker source on video —
        small content shifts move every layer's mean/var, re-exposing the
        whole frame (Gupta et al. 2017 §3 observe the same instability for
        per-frame normalization). ``return_stats=True`` additionally returns
        the list of f32 ``(mean, var)`` pairs (one per IN site, (B,1,1,C))
        this forward normalized with; passing such a list back as
        ``in_stats`` (typically captured from a reference frame with B=1 —
        it broadcasts over any frame batch) normalizes with
        ``stats_blend * ref + (1 - stats_blend) * per_frame`` moments
        instead. ``stats_blend=1.0`` freezes statistics entirely;
        intermediate values trade stability against adaptation to scene
        changes. Capture composes: apply-with-own-stats == plain apply.
        """
        multi = params["norm1"]["gamma"].ndim == 2
        if multi and style_weights is None:
            raise ValueError(
                f"multi-style params ({params['norm1']['gamma'].shape[0]} "
                "styles) need style_weights — or bake_style() them first"
            )
        if not multi and style_weights is not None:
            raise ValueError("style_weights given but params are single-style")
        if multi:
            style_weights = jnp.asarray(style_weights, jnp.float32)
        n_sites = 4 + 2 * NUM_RES_BLOCKS
        if in_stats is not None and len(in_stats) != n_sites:
            raise ValueError(
                f"in_stats has {len(in_stats)} entries; this net has "
                f"{n_sites} IN sites (capture with return_stats=True)")
        if norm_method in ("pallas", "onepass") and (
                in_stats is not None or return_stats):
            # the stats capture/inject path always uses the stable XLA
            # moment lowering (instance_norm_stats/apply_instance_norm_
            # stats); silently honoring a "pallas"/"onepass" opt-in here
            # would break the bit-identity contract between capture and
            # the plain forward
            raise ValueError(
                f"norm_method={norm_method!r} cannot be combined with "
                "in_stats/return_stats: the stats path uses the stable "
                "XLA lowering")

        in_dtype = x.dtype
        x = x.astype(precision.compute_dtype)

        def cin(p, h, *, stride=1):
            h = reflect_conv2d(h, p["w"], p["b"], stride=stride,
                               accum_dtype=precision.accum_dtype)
            return h.astype(precision.compute_dtype)

        def ctr(p, h):
            h = conv_transpose2d(h, p["w"], p["b"], stride=2, padding=1,
                                 output_padding=1, accum_dtype=precision.accum_dtype)
            return h.astype(precision.compute_dtype)

        sites_seen = [0]
        stats_out: list = []

        def inorm(h, p, *, relu):
            gamma, beta = p["gamma"], p["beta"]
            if multi:
                # (S,)@(S,C)->(C,) or (B,S)@(S,C)->(B,C); instance_norm
                # broadcasts either over (B,H,W,C)
                gamma = style_weights @ gamma
                beta = style_weights @ beta
            site, sites_seen[0] = sites_seen[0], sites_seen[0] + 1
            if in_stats is None and not return_stats:
                return instance_norm(h, gamma, beta, relu=relu,
                                     method=norm_method)
            from fast_neural_style_transfer_tpu.ops import (
                apply_instance_norm_stats,
                instance_norm_stats,
            )

            mean, var = instance_norm_stats(h)
            if return_stats:
                stats_out.append((mean, var))
            if in_stats is not None:
                rm, rv = in_stats[site]
                a = float(stats_blend)
                mean = a * rm + (1.0 - a) * mean
                var = a * rv + (1.0 - a) * var
            return apply_instance_norm_stats(h, mean, var, gamma, beta,
                                             relu=relu)

        # encoder
        h = inorm(cin(params["conv1"], x, stride=2), params["norm1"], relu=True)
        h = inorm(cin(params["conv2"], h, stride=2), params["norm2"], relu=True)

        # residual body
        use_dropout = train and rng is not None
        if use_dropout:
            drop_keys = jax.random.split(rng, NUM_RES_BLOCKS)
        for i, rb in enumerate(params["res_blocks"]):
            y = inorm(cin(rb["conv1"], h), rb["in1"], relu=True)
            if use_dropout:
                # Dropout2d: drop whole channels per sample (torch nn.Dropout2d(0.1))
                keep = jax.random.bernoulli(
                    drop_keys[i], 1.0 - DROPOUT_RATE, (y.shape[0], 1, 1, y.shape[3])
                )
                y = jnp.where(keep, y / (1.0 - DROPOUT_RATE), 0.0).astype(y.dtype)
            y = inorm(cin(rb["conv2"], y), rb["in2"], relu=False)
            h = h + y

        # decoder
        h = inorm(ctr(params["up1"], h), params["norm3"], relu=True)
        h = inorm(ctr(params["up2"], h), params["norm4"], relu=True)
        out = cin(params["final_conv"], h)
        out = out.astype(in_dtype)
        if return_stats:
            return out, stats_out
        return out

    @staticmethod
    def param_count(params: Params) -> int:
        return sum(int(p.size) for p in jax.tree.leaves(params))
