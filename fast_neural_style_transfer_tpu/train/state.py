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


def _walk_opt_state(node: Any, on_adam, on_schedule, on_multistep) -> Any:
    """Rebuild an optax state tree, rewriting the stateful NamedTuples."""
    if isinstance(node, optax.ScaleByAdamState):
        return on_adam(node)
    if isinstance(node, optax.ScaleByScheduleState):
        return on_schedule(node)
    if type(node).__name__ == "MultiStepsState":
        node = on_multistep(node)
        return type(node)(*[
            _walk_opt_state(c, on_adam, on_schedule, on_multistep)
            if name == "inner_opt_state" else c
            for name, c in zip(node._fields, node)
        ])
    if isinstance(node, tuple) and not hasattr(node, "_fields"):
        return tuple(
            _walk_opt_state(c, on_adam, on_schedule, on_multistep) for c in node
        )
    return node


def state_from_reference_checkpoint(
    path: str,
    optimizer: optax.GradientTransformation,
    *,
    grad_accum: int = 1,
) -> TrainState:
    """Full resume from a reference training checkpoint ``.pth``.

    Restores params, Adam first/second moments, the bias-correction count,
    the cosine-schedule position, and the iteration — the state
    /root/reference/train.py:39-66 restores on its resume path. The
    loss-weight schedule needs no explicit state: ours is a pure function of
    step (the reference's resume re-derivation of the weights was
    inconsistent with its in-loop schedule — defect ledger #5; the in-loop
    semantics win).

    With ``grad_accum`` > 1 the reference's iterations are treated as applied
    optimizer updates (the reference has no accumulation), so the micro-step
    counter is scaled to keep schedules aligned.
    """
    from fast_neural_style_transfer_tpu.export.torch_convert import (
        from_torch_training_checkpoint,
    )

    import numpy as np

    params, mu, nu, adam_count, iteration = from_torch_training_checkpoint(path)
    opt_state = optimizer.init(params)
    # NB: numpy (not jnp.asarray) scalars — jnp's small-constant cache can
    # hand back a SHARED device buffer, and donating a shared buffer through
    # the jitted step fails on TPU with INVALID_ARGUMENT. numpy leaves get a
    # fresh buffer from the replicate_state device_put.
    count32 = np.asarray(adam_count, np.int32)
    opt_state = _walk_opt_state(
        opt_state,
        on_adam=lambda s: s._replace(count=count32, mu=mu, nu=nu),
        on_schedule=lambda s: s._replace(count=count32),
        on_multistep=lambda s: s._replace(
            mini_step=np.zeros_like(s.mini_step),
            gradient_step=np.asarray(adam_count, s.gradient_step.dtype),
        ),
    )
    return TrainState(
        params=params,
        opt_state=opt_state,
        step=np.asarray(iteration * grad_accum, np.int32),
    )


def extract_adam_moments(opt_state: Any):
    """(mu, nu, count) out of any optimizer state built by make_optimizer —
    the inverse of the injection above, for exporting reference-format
    training checkpoints."""
    found = {}

    def grab(s):
        found["adam"] = s
        return s

    _walk_opt_state(opt_state, on_adam=grab, on_schedule=lambda s: s,
                    on_multistep=lambda s: s)
    if "adam" not in found:
        raise ValueError("no ScaleByAdamState in optimizer state")
    s = found["adam"]
    return s.mu, s.nu, int(s.count)


def param_global_norm(tree: Any) -> jnp.ndarray:
    return optax.global_norm(tree)


def replicate_state(state: TrainState, sharding: jax.sharding.Sharding) -> TrainState:
    """Place every leaf replicated on the mesh (params/opt state are DP-replicated)."""
    return jax.tree.map(lambda x: jax.device_put(x, sharding), state)
