"""Training state + optimizer, matching the reference's recipe exactly.

Reference optimizer (/root/reference/train.py:135-145,203):
    Adam(lr=1e-3, betas=(0.9, 0.999), eps=1e-8, weight_decay=1e-5)
    + CosineAnnealingLR(T_max=total_steps, eta_min=1e-7), stepped per iter
    + clip_grad_norm_(max_norm=1.0) before the optimizer step

Torch's Adam ``weight_decay`` is L2-into-gradient (not AdamW), applied to the
*clipped* gradient, so the optax chain order below is: global-norm clip ->
add_decayed_weights -> scale_by_adam -> lr. State is a NamedTuple pytree so
the whole thing donates cleanly through jit.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from fast_neural_style_transfer_tpu.train.schedule import cosine_lr_schedule


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray  # int32 scalar


def make_optimizer(
    lr: float = 1e-3,
    total_steps: int = 80_000,
    *,
    weight_decay: float = 1e-5,
    clip_norm: float = 1.0,
    eta_min: float = 1e-7,
    grad_accum: int = 1,
) -> optax.GradientTransformation:
    """The reference's exact recipe, optionally wrapped in gradient
    accumulation (``grad_accum`` micro-batches averaged per applied update —
    large effective batches without the activation memory)."""
    # the cosine advances once per APPLIED update; total_steps counts
    # micro-steps, so convert for the schedule's horizon
    applied_steps = max(total_steps // grad_accum, 1)
    opt = optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(cosine_lr_schedule(lr, applied_steps, eta_min)),
    )
    if grad_accum > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=grad_accum)
    return opt


def create_train_state(
    params: Any,
    optimizer: optax.GradientTransformation,
    *,
    step: int = 0,
) -> TrainState:
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        step=jnp.asarray(step, jnp.int32),
    )


def param_global_norm(tree: Any) -> jnp.ndarray:
    return optax.global_norm(tree)


def replicate_state(state: TrainState, sharding: jax.sharding.Sharding) -> TrainState:
    """Place every leaf replicated on the mesh (params/opt state are DP-replicated)."""
    return jax.tree.map(lambda x: jax.device_put(x, sharding), state)
