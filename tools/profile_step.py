#!/usr/bin/env python
"""Profile a train step on the attached TPU and print an hlo_stats
category/op breakdown (the tool behind DESIGN.md §8's attribution tables).

    python tools/profile_step.py [batch] [outdir]          # flagship step
    python tools/profile_step.py [batch] [outdir] adain    # AdaIN step
"""
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


def build_adain_step(batch=8):
    """The AdaIN decoder train step (train/adain.py) with device-resident
    uint8 batches, packaged behind the same run(state) interface."""
    import optax

    from fast_neural_style_transfer_tpu.core.dtypes import Precision
    from fast_neural_style_transfer_tpu.models.adain import AdaINDecoder
    from fast_neural_style_transfer_tpu.models.vgg import VGG19Features
    from fast_neural_style_transfer_tpu.train.adain import make_adain_train_step
    from fast_neural_style_transfer_tpu.train.state import create_train_state

    prec = Precision.bf16() if jax.devices()[0].platform == "tpu" else Precision.f32()
    key = jax.random.PRNGKey(0)
    vgg = VGG19Features.init(key)
    opt = optax.adam(1e-4)
    state = create_train_state(AdaINDecoder.init(key), opt)
    step = make_adain_train_step(opt, precision=prec)
    rng = np.random.default_rng(1)
    content = jnp.asarray(rng.integers(0, 256, (batch, 256, 256, 3)), jnp.uint8)
    style = jnp.asarray(rng.integers(0, 256, (batch, 256, 256, 3)), jnp.uint8)
    return lambda s: step(s, vgg, content, style), state


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/profile_step"
    family = sys.argv[3] if len(sys.argv) > 3 else "flagship"
    if family == "adain":
        run, state = build_adain_step(batch)
    else:
        step, state, vgg, x, grams, rng = build_step(batch)
        run = lambda s: step(s, vgg, x, grams, rng)
    # compile + warm
    for _ in range(2):
        state, m = run(state)
    float(m["loss"])

    jax.profiler.start_trace(outdir)
    for _ in range(3):
        state, m = run(state)
    float(m["loss"])
    jax.profiler.stop_trace()

    # wall measurement (chain of 10)
    t0 = time.perf_counter()
    for _ in range(10):
        state, m = run(state)
    float(m["loss"])
    wall = (time.perf_counter() - t0) * 1000 / 10
    print(f"wall per step (incl. one RTT/10): {wall:.1f} ms")

    xspaces = sorted(glob.glob(f"{outdir}/**/*.xplane.pb", recursive=True))
    print("xplane:", xspaces[-1] if xspaces else "NONE")


if __name__ == "__main__":
    main()
