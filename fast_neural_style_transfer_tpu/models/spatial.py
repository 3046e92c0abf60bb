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
    extent=None,
) -> jnp.ndarray:
    """H-sharded mirror of TransformerNet.apply (models/transformer.py).

    ``extent`` (optional, traced scalar OK): global active H at input scale
    (multiple of 4). When set, rows < extent compute exactly as the
    unsharded forward on an extent-tall input: reflect convs pin the
    virtual boundary rows an unsharded reflect pad would supply, instance
    norms mask dead rows out of their global moments, transpose convs zero
    the one boundary row their padding expects, and extents track the
    stride-2 downs and x2 ups. The pin counts come from which pad rows a
    conv's ACTIVE outputs actually read: a k9 stride-1 conv reads all 4, a
    k9 stride-2 conv reads 3 (its last active window starts 2 rows earlier),
    and a k3 stride-2 conv reads none. Used by infer/spatial.py for
    non-shard-aligned heights; None (training, aligned serving) is the
    previous exact path, zero overhead."""
    in_dtype = x.dtype
    h = x.astype(precision.compute_dtype)
    e = extent  # global active H at the CURRENT scale

    def conv(p, v, stride=1):
        if e is not None:
            pad = p["w"].shape[0] // 2
            pin = pad if stride == 1 else pad - stride + 1
            if pin > 0:
                v = sh.pin_reflect_rows(v, e, pin, axis=axis)
        return sh.reflect_conv2d_sharded(v, p["w"], p["b"], stride=stride,
                                         axis=axis).astype(precision.compute_dtype)

    def up(p, v):
        if e is not None:
            # transpose-conv padding is zeros: the one input row past the
            # extent that active outputs read must be zero, not slab junk
            v = sh.set_global_row(v, e, jnp.zeros(
                (v.shape[0], 1, v.shape[2], v.shape[3]), v.dtype), axis=axis)
        return sh.conv_transpose2d_sharded(v, p["w"], p["b"],
                                           axis=axis).astype(precision.compute_dtype)

    def inorm(v, p, relu):
        return sh.instance_norm_sharded(v, p["gamma"], p["beta"], relu=relu,
                                        axis=axis, extent=e)

    # extent bookkeeping: pins happen inside conv/up at the INPUT scale, so
    # `e` advances between the conv and its instance norm (whose mask needs
    # the OUTPUT scale)
    h = conv(params["conv1"], h, 2)
    e = None if e is None else e // 2
    h = inorm(h, params["norm1"], True)
    h = conv(params["conv2"], h, 2)
    e = None if e is None else e // 2
    h = inorm(h, params["norm2"], True)
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
    h = up(params["up1"], h)
    e = None if e is None else e * 2
    h = inorm(h, params["norm3"], True)
    h = up(params["up2"], h)
    e = None if e is None else e * 2
    h = inorm(h, params["norm4"], True)
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
