#!/usr/bin/env python
"""Profile the b20 train step on the attached TPU and print an hlo_stats
category/op breakdown (the tool behind DESIGN.md §8's attribution tables)."""
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build_step(batch=20):
    from fast_neural_style_transfer_tpu.core.dtypes import Precision
    from fast_neural_style_transfer_tpu.losses import LossTaps, style_targets_from_features
    from fast_neural_style_transfer_tpu.models import TransformerNet, VGG19Features
    from fast_neural_style_transfer_tpu.train import (
        LossWeightSchedule, create_train_state, make_train_step)
    from fast_neural_style_transfer_tpu.train.state import make_optimizer

    prec = Precision.bf16() if jax.devices()[0].platform == "tpu" else Precision.f32()
    taps = LossTaps(content_tap="relu4_2")
    key = jax.random.PRNGKey(0)
    vgg = VGG19Features.init(key)
    style = jnp.asarray(np.random.default_rng(0).normal(size=(1, 256, 256, 3)), jnp.float32)
    grams = tuple(style_targets_from_features(
        VGG19Features.apply(vgg, style, taps.style_taps, precision=prec)))
    opt = make_optimizer(1e-3, 1000)
    state = create_train_state(TransformerNet.init(key), opt)
    step = make_train_step(opt, taps=taps, weight_schedule=LossWeightSchedule(),
                           precision=prec, lr=1e-3, total_steps=1000)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(batch, 256, 256, 3)), jnp.float32)
    rng = jax.random.PRNGKey(1)
    return step, state, vgg, x, grams, rng


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/profile_step"
    step, state, vgg, x, grams, rng = build_step(batch)
    # compile + warm
    for _ in range(2):
        state, m = step(state, vgg, x, grams, rng)
    float(m["loss"])

    jax.profiler.start_trace(outdir)
    for _ in range(3):
        state, m = step(state, vgg, x, grams, rng)
    float(m["loss"])
    jax.profiler.stop_trace()

    # wall measurement (chain of 10)
    t0 = time.perf_counter()
    for _ in range(10):
        state, m = step(state, vgg, x, grams, rng)
    float(m["loss"])
    wall = (time.perf_counter() - t0) * 1000 / 10
    print(f"wall per step (incl. one RTT/10): {wall:.1f} ms")

    xspaces = sorted(glob.glob(f"{outdir}/**/*.xplane.pb", recursive=True))
    print("xplane:", xspaces[-1] if xspaces else "NONE")


if __name__ == "__main__":
    main()
