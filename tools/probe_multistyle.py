#!/usr/bin/env python
"""A/B: multi-style (conditional-IN) train-step cost vs single-style.

The design claim (DESIGN.md §10) is that conditioning is ~free: style
selection is a (B, S) @ (S, C) matmul per norm plus an einsum over
(S, c, c) Gram banks, all fused by XLA. This measures the full b96 bf16
train step both ways on the attached chip with the chained-fetch method
(bench.py: one D2H scalar per chain, RTT subtracted).

    python tools/probe_multistyle.py [batch] [num_styles]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def step_time_ms(num_styles: int, batch: int, iters: int = 10,
                 samples: int = 3) -> float:
    from fast_neural_style_transfer_tpu.core.dtypes import Precision
    from fast_neural_style_transfer_tpu.losses import (
        LossTaps,
        style_targets_from_features,
    )
    from fast_neural_style_transfer_tpu.models import TransformerNet, VGG19Features
    from fast_neural_style_transfer_tpu.train import (
        LossWeightSchedule,
        create_train_state,
        make_train_step,
    )
    from fast_neural_style_transfer_tpu.train.state import make_optimizer

    prec = Precision.bf16()
    taps = LossTaps(content_tap="relu4_2")
    key = jax.random.PRNGKey(0)
    vgg = VGG19Features.init(key)
    style = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 256, 256, 3)), jnp.float32
    )
    grams = tuple(
        style_targets_from_features(
            VGG19Features.apply(vgg, style, taps.style_taps, precision=prec)
        )
    )
    if num_styles > 1:
        # S distinct rows per bank (values don't affect timing; shapes do)
        grams = tuple(
            jnp.stack([g * (1.0 + 0.1 * s) for s in range(num_styles)])
            for g in grams
        )
    opt = make_optimizer(1e-3, 1000)
    state = create_train_state(
        TransformerNet.init(key, num_styles=num_styles), opt
    )
    step = make_train_step(opt, taps=taps, weight_schedule=LossWeightSchedule(),
                           precision=prec, lr=1e-3, total_steps=1000,
                           num_styles=num_styles)
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(batch, 256, 256, 3)), jnp.float32
    )
    rng = jax.random.PRNGKey(1)

    for _ in range(2):  # compile + warm
        state, m = step(state, vgg, x, grams, rng)
    float(m["loss"])

    best = []
    for _ in range(samples):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, vgg, x, grams, rng)
        float(m["loss"])  # chain through state serializes; one fetch
        best.append((time.perf_counter() - t0) * 1000.0 / iters)
    return float(np.percentile(best, 50))


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    t1 = step_time_ms(1, batch)
    ts = step_time_ms(s, batch)
    print(f"b{batch} bf16 full step: single-style {t1:.2f} ms, "
          f"{s}-style conditional-IN {ts:.2f} ms "
          f"({(ts / t1 - 1) * 100:+.1f}%)")


if __name__ == "__main__":
    main()
