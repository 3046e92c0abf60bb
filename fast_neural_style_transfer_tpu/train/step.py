"""The jitted train step: all three forwards + losses + grad + Adam update.

The reference runs stylizer forward, two VGG forwards, losses, backward and
optimizer step as separate eager calls per iteration
(/root/reference/train.py:162-291). Here the *entire* iteration is one XLA
program: jit fuses the element-wise work into the convs, overlaps the VGG
branches, and — when the batch is sharded over the mesh's ``data`` axis with
replicated params — inserts the gradient ``psum`` over ICI automatically.

Reproduced semantics:
- stylized activations clamped to [-3, 3] before the loss (train.py:174)
- content features computed with gradients stopped (train.py:177-178's
  no_grad); style/content/tv losses with reference-exact normalizations
- NaN/inf loss guard: a non-finite total loss skips the parameter/optimizer
  update for that step (train.py:193-196) — expressed as a ``jnp.where``
  select so it stays branch-free under jit
- loss-weight schedule evaluated from the step counter (resumable, defect #5)
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from fast_neural_style_transfer_tpu.core.dtypes import Precision
from fast_neural_style_transfer_tpu.losses import (
    LossTaps,
    content_loss,
    style_loss,
    total_variation_loss,
)
from fast_neural_style_transfer_tpu.models import TransformerNet, VGG19Features
from fast_neural_style_transfer_tpu.train.schedule import (
    LossWeightSchedule,
    cosine_lr_schedule,
)
from fast_neural_style_transfer_tpu.train.state import TrainState

from fast_neural_style_transfer_tpu.utils.image_io import (
    IMAGENET_MEAN as _IMAGENET_MEAN,
    IMAGENET_STD as _IMAGENET_STD,
)

ACTIVATION_CLAMP = 3.0


def normalize_u8_batch(batch: jnp.ndarray) -> jnp.ndarray:
    """uint8 NHWC -> network-space float32, on device.

    The input pipeline ships raw uint8 (4x fewer host->device bytes than
    pre-normalized f32 — the end-to-end soak showed transfer, not decode,
    bounds host throughput); XLA fuses this affine into the first conv's
    prologue. No-op for float input, so pre-normalized batches (tests,
    library callers) keep working. Resolved at trace time (dtype is
    static)."""
    if batch.dtype != jnp.uint8:
        return batch
    mean = jnp.asarray(_IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(_IMAGENET_STD, jnp.float32)
    return (batch.astype(jnp.float32) / 255.0 - mean) / std


def loss_fn(
    params: Any,
    vgg_params: Any,
    batch: jnp.ndarray,
    style_grams: Sequence[jnp.ndarray],
    weights: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
    rng: Optional[jax.Array],
    *,
    taps: LossTaps,
    precision: Precision,
    train: bool = True,
    style_select: Optional[jnp.ndarray] = None,
    remat: bool = False,
    batch_mask: Optional[jnp.ndarray] = None,
    norm_method: str = "auto",
):
    """Weighted perceptual loss for one batch; returns (total, metrics).

    ``style_select`` (multi-style training only): (B, S) one-hot rows pairing
    each example with a style — conditions the stylizer's instance norms AND
    picks the matching row of each (S, c, c) style-Gram bank, so generator
    and loss always agree on which style an example is being pushed toward.

    ``batch_mask`` ((B,) 0/1 floats): zeroes padding examples out of every
    loss term. All three reference losses are batch SUM-reductions (TV's
    per-batch normalizer uses the real count), so a step on a padded batch
    with the mask computes bit-exact real-batch gradients — the
    ``--pad_batch`` path for TPU-hostile shapes like the reference's b20.

    ``remat``: rematerialize the two gradient-bearing forwards (stylizer,
    VGG over the stylized batch) in the backward pass instead of keeping
    their activations live — the standard TPU HBM-for-FLOPs trade
    (``jax.checkpoint``). Identical math and gradients; backward recomputes
    each segment once, so expect roughly +1 forward of step time in
    exchange for the peak-activation memory, which is what bounds the max
    batch (or image size) per chip. The content-VGG branch needs nothing:
    it is under stop_gradient, so XLA already stores none of it.
    """
    cw, sw, tw = weights
    batch = normalize_u8_batch(batch)

    def net_fwd(p, b, r, sel):
        out = TransformerNet.apply(p, b, train=train, rng=r,
                                   precision=precision, style_weights=sel,
                                   norm_method=norm_method)
        return jnp.clip(out, -ACTIVATION_CLAMP, ACTIVATION_CLAMP)

    tap_names = taps.all_taps

    def vgg_fwd(vp, s):
        return VGG19Features.apply(vp, s, tap_names, precision=precision)

    if remat:
        net_fwd = jax.checkpoint(net_fwd)
        vgg_fwd = jax.checkpoint(vgg_fwd)
    if batch_mask is not None and batch_mask.shape != (batch.shape[0],):
        raise ValueError(
            f"batch_mask shape {batch_mask.shape} != ({batch.shape[0]},)")
    stylized = net_fwd(params, batch, rng, style_select)

    content_feats = VGG19Features.apply(
        jax.lax.stop_gradient(vgg_params),
        jax.lax.stop_gradient(batch),
        tap_names,
        precision=precision,
    )
    content_feats = [jax.lax.stop_gradient(f) for f in content_feats]
    stylized_feats = vgg_fwd(vgg_params, stylized)

    s_feats, c_feat_stylized = taps.split(stylized_feats)
    _, c_feat_target = taps.split(content_feats)

    c_loss = cw * content_loss(c_feat_stylized, c_feat_target,
                               batch_mask=batch_mask)
    s_loss = sw * style_loss(s_feats, style_grams, taps.style_weights,
                             style_select=style_select,
                             batch_mask=batch_mask)
    t_loss = tw * total_variation_loss(stylized, batch_mask=batch_mask)
    total = c_loss + s_loss + t_loss
    metrics = {
        "loss": total,
        "content_loss": c_loss,
        "style_loss": s_loss,
        "tv_loss": t_loss,
    }
    return total, metrics


def make_train_step(
    optimizer: optax.GradientTransformation,
    *,
    taps: LossTaps = LossTaps(),
    weight_schedule: LossWeightSchedule = LossWeightSchedule(),
    precision: Precision = Precision.f32(),
    lr: float = 1e-3,
    total_steps: int = 80_000,
    grad_accum: int = 1,
    donate: bool = True,
    num_styles: int = 1,
    remat: bool = False,
    dropout: bool = True,
    norm_method: str = "auto",
) -> Callable:
    """Build the jitted ``step(state, vgg_params, batch, style_grams, rng)``.

    ``vgg_params``/``style_grams`` are traced arguments (not baked constants)
    so one compilation serves any style image and any VGG weights.

    ``num_styles > 1`` (conditional-IN training, one net for S styles): each
    step splits its rng and samples a uniform style index per example; the
    one-hot (B, S) matrix conditions the stylizer's instance norms and
    selects each example's row in the (S, c, c) style-Gram banks. Sampling
    lives inside the jitted step — the input pipeline, checkpointing, and
    the multichip sharding story are untouched.

    ``dropout=False`` disables the res-block Dropout2d (the one op whose
    randomness cannot be matched across frameworks) while keeping every
    other semantic — used by the lockstep training-dynamics parity harness
    (tests/test_lockstep_parity.py) to run this step and the reference's
    executable trainer on identical math.

    Step unit: every schedule (cosine LR and the loss-weight halving/doubling)
    is a function of APPLIED optimizer updates. ``state.step`` counts
    micro-steps; with ``grad_accum`` micro-batches per update the applied
    count is ``state.step // grad_accum`` over a ``total_steps // grad_accum``
    horizon — exactly the horizon ``make_optimizer`` gives its own cosine, so
    the logged ``metrics["lr"]`` equals the LR the optimizer applies
    (regression-tested in tests/test_train.py).
    """
    applied_horizon = max(total_steps // grad_accum, 1)
    lr_schedule = cosine_lr_schedule(lr, applied_horizon)

    def step_fn(
        state: TrainState,
        vgg_params: Any,
        batch: jnp.ndarray,
        style_grams: Tuple[jnp.ndarray, ...],
        rng: jax.Array,
        batch_mask: Optional[jnp.ndarray] = None,
    ):
        applied_step = state.step // grad_accum
        weights = weight_schedule(applied_step)
        style_select = None
        if num_styles > 1:
            rng, style_rng = jax.random.split(rng)
            idx = jax.random.randint(
                style_rng, (batch.shape[0],), 0, num_styles
            )
            style_select = jax.nn.one_hot(idx, num_styles, dtype=jnp.float32)
        grads, metrics = jax.grad(
            functools.partial(loss_fn, taps=taps, precision=precision,
                              style_select=style_select, remat=remat,
                              batch_mask=batch_mask,
                              norm_method=norm_method),
            has_aux=True,
        )(state.params, vgg_params, batch, style_grams, weights,
          rng if dropout else None)

        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)

        # NaN/inf guard: keep old params & opt state when the loss blew up.
        finite = jnp.isfinite(metrics["loss"])
        select = lambda new, old: jax.tree.map(
            lambda n, o: jnp.where(finite, n, o), new, old
        )
        new_params = select(new_params, state.params)
        new_opt_state = select(new_opt_state, state.opt_state)

        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        metrics["lr"] = lr_schedule(applied_step)
        metrics["skipped_nonfinite"] = (~finite).astype(jnp.float32)
        # a skipped step advances NOTHING: opt state was reverted above, so
        # the step counter must hold too or every schedule keyed on
        # state.step (lr metric, loss weights) would run one step ahead of
        # the optimizer's own reverted cosine count per skip, permanently
        new_state = TrainState(
            params=new_params,
            opt_state=new_opt_state,
            step=state.step + finite.astype(state.step.dtype),
        )
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_eval_forward(
    *, precision: Precision = Precision.f32()
) -> Callable:
    """Jitted eval-mode stylizer forward (monitor sampling / inference)."""

    def fwd(params: Any, x: jnp.ndarray) -> jnp.ndarray:
        return TransformerNet.apply(params, x, train=False, precision=precision)

    return jax.jit(fwd)
