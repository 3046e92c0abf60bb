"""Learning-rate and loss-weight schedules — explicit and resumable.

The reference had two *contradictory* weight schedules (defect #5 in SURVEY.md
§2.3): in-loop ``content/=2, style*=2`` every 10k iters
(/root/reference/train.py:237-239) versus a power-of-10 reconstruction on
resume (train.py:127-129). This rebuild keeps ONE closed-form schedule — the
in-loop halving/doubling, which is what checkpoints actually trained under —
expressed as a pure function of the step so resume is trivially consistent.

LR matches torch.optim.lr_scheduler.CosineAnnealingLR(T_max=total_steps,
eta_min=1e-7) stepped once per iteration (train.py:141-145,206).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


def cosine_lr_schedule(base_lr: float, total_steps: int, eta_min: float = 1e-7):
    """Closed form of torch CosineAnnealingLR under step-per-iteration use."""

    def schedule(step):
        t = jnp.minimum(step, total_steps).astype(jnp.float32)
        cos = jnp.cos(jnp.pi * t / total_steps)
        return eta_min + (base_lr - eta_min) * (1.0 + cos) / 2.0

    return schedule


@dataclasses.dataclass(frozen=True)
class LossWeightSchedule:
    """Step-dependent (content, style, tv) weights.

    Defaults = reference code behavior: content 1000 halved / style 1 doubled
    every 10k iterations, TV 10 constant (config.py:11-15, train.py:121-122,
    237-239). ``decay_every=0`` disables the decay (honoring CLI weights
    verbatim — fixing defect #4 is the caller choosing its own base weights).
    """

    content: float = 1000.0
    style: float = 1.0
    tv: float = 10.0
    decay_every: int = 10_000

    def __call__(self, step):
        step = jnp.asarray(step)  # accept plain Python ints too
        if self.decay_every <= 0:
            k = jnp.asarray(0.0, jnp.float32)
        else:
            k = (step // self.decay_every).astype(jnp.float32)
        return (
            self.content * jnp.power(0.5, k),
            self.style * jnp.power(2.0, k),
            jnp.asarray(self.tv, jnp.float32),
        )
