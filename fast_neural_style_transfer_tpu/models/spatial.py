"""H-sharded model forwards (run inside shard_map over the 'space' axis).

Mirrors of ``TransformerNet.apply`` and ``VGG19Features.apply`` built from
``ops/sharded.py``: per-layer halo exchange makes the convs exact and psum'd
statistics make instance norm truly global, so outputs are numerically
identical to the unsharded forwards (tested in tests/test_spatial_train.py).

Shard-size constraints (local H per shard):
- stylizer: divisible by 4 (two stride-2 encoder convs);
- VGG through relu4_3: divisible by 8 (three 2x2 pools).

Dropout masks are per (sample, channel) — identical on every shard because
the replicated rng produces the same mask everywhere, which is exactly the
semantics of channel dropout on the unsharded image.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp

from fast_neural_style_transfer_tpu.core.dtypes import Precision
from fast_neural_style_transfer_tpu.models.transformer import DROPOUT_RATE, NUM_RES_BLOCKS
from fast_neural_style_transfer_tpu.models.vgg import tap_walk
from fast_neural_style_transfer_tpu.ops import sharded as sh


def transformer_forward_sharded(
    params: Any,
    x: jnp.ndarray,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    precision: Precision = Precision.f32(),
    axis: str = sh.AXIS,
) -> jnp.ndarray:
    """H-sharded mirror of TransformerNet.apply (models/transformer.py)."""
    in_dtype = x.dtype
    h = x.astype(precision.compute_dtype)

    def conv(p, v, stride=1):
        return sh.reflect_conv2d_sharded(v, p["w"], p["b"], stride=stride,
                                         axis=axis).astype(precision.compute_dtype)

    def up(p, v):
        return sh.conv_transpose2d_sharded(v, p["w"], p["b"],
                                           axis=axis).astype(precision.compute_dtype)

    def inorm(v, p, relu):
        return sh.instance_norm_sharded(v, p["gamma"], p["beta"], relu=relu, axis=axis)

    h = inorm(conv(params["conv1"], h, 2), params["norm1"], True)
    h = inorm(conv(params["conv2"], h, 2), params["norm2"], True)
    use_dropout = train and rng is not None
    if use_dropout:
        drop_keys = jax.random.split(rng, NUM_RES_BLOCKS)
    for i, rb in enumerate(params["res_blocks"]):
        y = inorm(conv(rb["conv1"], h), rb["in1"], True)
        if use_dropout:
            keep = jax.random.bernoulli(
                drop_keys[i], 1.0 - DROPOUT_RATE, (y.shape[0], 1, 1, y.shape[3])
            )
            y = jnp.where(keep, y / (1.0 - DROPOUT_RATE), 0.0).astype(y.dtype)
        y = inorm(conv(rb["conv2"], y), rb["in2"], False)
        h = h + y
    h = inorm(up(params["up1"], h), params["norm3"], True)
    h = inorm(up(params["up2"], h), params["norm4"], True)
    return conv(params["final_conv"], h).astype(in_dtype)


def vgg_features_sharded(
    params: Any,
    x: jnp.ndarray,
    taps: Sequence[str],
    *,
    precision: Precision = Precision.f32(),
    axis: str = sh.AXIS,
    extent=None,
) -> List[jnp.ndarray]:
    """H-sharded mirror of VGG19Features.apply: the same ``tap_walk`` with
    halo-exchanging conv/pool primitives (models/vgg.py owns the walk).

    ``extent`` (optional, traced scalar OK): global active H at input scale.
    When set, rows >= extent are zeroed after every conv, which makes rows
    < extent bit-equal to an unsharded forward on an input of exactly
    ``extent`` rows — zero-SAME convs see implicit zeros past the true
    boundary either way — provided the caller zero-pads the input beyond
    ``extent``. Pools halve the extent (it must stay even at each of the
    three pools: extent % 8 == 0). Used by infer/spatial_adain.py to match
    the single-device path at heights not divisible by the shard count."""
    if extent is None:
        conv_fn = lambda p, h: sh.conv2d_same_sharded(  # noqa: E731
            h, p["w"], p["b"], axis=axis)
        pool_fn = sh.max_pool2d_sharded
    else:
        state = {"e": extent}

        def conv_fn(p, h):
            out = sh.conv2d_same_sharded(h, p["w"], p["b"], axis=axis)
            # re-zero the dead rows: the conv's bias (then relu) would
            # otherwise resurrect them and leak into the next layer's
            # boundary rows
            return sh.mask_rows_from(out, state["e"], axis=axis)

        def pool_fn(h):
            out = sh.max_pool2d_sharded(h)
            state["e"] = state["e"] // 2
            return out

    return tap_walk(
        params,
        x,
        taps,
        conv_fn=conv_fn,
        pool_fn=pool_fn,
        compute_dtype=precision.compute_dtype,
    )
