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


def _init_in(c: int):
    return {"gamma": jnp.ones((c,), jnp.float32), "beta": jnp.zeros((c,), jnp.float32)}


class TransformerNet:
    """Pure-functional stylizer: ``init`` builds params, ``apply`` runs NHWC."""

    @staticmethod
    def init(key: jax.Array) -> Params:
        keys = jax.random.split(key, 16)
        params: Params = {
            "conv1": _init_conv(keys[0], 9, 3, 64),
            "norm1": _init_in(64),
            "conv2": _init_conv(keys[1], 3, 64, 256),
            "norm2": _init_in(256),
            "res_blocks": [],
            "up1": _init_conv(keys[2], 3, 256, 64, transpose=True),
            "norm3": _init_in(64),
            "up2": _init_conv(keys[3], 3, 64, 32, transpose=True),
            "norm4": _init_in(32),
            "final_conv": _init_conv(keys[4], 9, 32, 3),
        }
        for i in range(NUM_RES_BLOCKS):
            rk = jax.random.split(keys[5 + i])
            params["res_blocks"].append(
                {
                    "conv1": _init_conv(rk[0], 3, 256, 256),
                    "in1": _init_in(256),
                    "conv2": _init_conv(rk[1], 3, 256, 256),
                    "in2": _init_in(256),
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
    ) -> jnp.ndarray:
        """NHWC forward. H and W must be multiples of 4 for exact round-trip.

        ``norm_method`` selects the instance-norm lowering. "auto" resolves
        to the XLA path (measured faster at these shapes — XLA fuses IN into
        the producing conv's epilogue); the fused Pallas IN+ReLU kernel is an
        explicit opt-in via ``norm_method="pallas"`` (ops/norm.py).
        """
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

        def inorm(h, p, *, relu):
            return instance_norm(h, p["gamma"], p["beta"], relu=relu,
                                 method=norm_method)

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
        return out.astype(in_dtype)

    @staticmethod
    def param_count(params: Params) -> int:
        return sum(int(p.size) for p in jax.tree.leaves(params))
