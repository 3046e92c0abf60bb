#!/usr/bin/env python
"""AdaIN family chip probe: train-step cost by batch shape + inference p50.

The second model family (models/adain.py, train/adain.py) shipped with CPU
tests only; this measures it on the attached chip with the chained-fetch
method (bench.py: one D2H scalar per chain of data-dependent iterations,
tunnel RTT subtracted). Two questions:

  1. AdaIN decoder TRAIN step (3 VGG encodes to relu4_1 + decoder fwd/bwd)
     — ms/step and images/s/chip across batch shapes, vs the flagship
     trainer's scaling curve (DESIGN.md §8).
  2. Arbitrary-style INFERENCE forward (2 VGG encodes + decoder) — p50 ms
     at 256^2/512^2.

    python tools/probe_adain.py train 8 32 96      # batches to probe
    python tools/probe_adain.py infer 256 512      # resolutions to probe
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def _rtt(repeats: int = 5) -> float:
    f = jax.jit(lambda a: jnp.sum(a))
    x = jnp.ones((8, 8), jnp.float32)
    float(f(x))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(f(x))
        ts.append((time.perf_counter() - t0) * 1000.0)
    return float(np.median(ts))


def train_step_ms(batch: int, iters: int = 10, samples: int = 3) -> float:
    """Full jitted AdaIN train step, device-resident uint8 batches (the
    pipeline's transport dtype), chained through the donated state."""
    import optax

    from fast_neural_style_transfer_tpu.core.dtypes import Precision
    from fast_neural_style_transfer_tpu.models.adain import AdaINDecoder
    from fast_neural_style_transfer_tpu.models.vgg import VGG19Features
    from fast_neural_style_transfer_tpu.train.adain import make_adain_train_step
    from fast_neural_style_transfer_tpu.train.state import create_train_state

    prec = Precision.bf16()
    key = jax.random.PRNGKey(0)
    vgg = VGG19Features.init(key)
    opt = optax.adam(1e-4)
    state = create_train_state(AdaINDecoder.init(key), opt)
    step = make_adain_train_step(opt, precision=prec)

    rng = np.random.default_rng(1)
    content = jnp.asarray(rng.integers(0, 256, (batch, 256, 256, 3)), jnp.uint8)
    style = jnp.asarray(rng.integers(0, 256, (batch, 256, 256, 3)), jnp.uint8)

    for _ in range(2):
        state, m = step(state, vgg, content, style)
    float(m["loss"])
    rtt = _rtt(3)

    med = []
    for _ in range(samples):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, vgg, content, style)
        float(m["loss"])
        med.append(((time.perf_counter() - t0) * 1000.0 - rtt) / iters)
    return float(np.percentile(med, 50))


def infer_ms(hw: int, chain: int = 10, samples: int = 3) -> float:
    import functools

    from fast_neural_style_transfer_tpu.core.dtypes import Precision
    from fast_neural_style_transfer_tpu.models import AdaINDecoder, stylize_arbitrary
    from fast_neural_style_transfer_tpu.models.vgg import VGG19Features

    prec = Precision.bf16()
    vgg = VGG19Features.init(jax.random.PRNGKey(0))
    dec = AdaINDecoder.init(jax.random.PRNGKey(1))
    rng = np.random.default_rng(0)
    style = jnp.asarray(rng.normal(size=(1, 256, 256, 3)), jnp.float32)
    x0 = jnp.asarray(rng.normal(size=(1, hw, hw, 3)), jnp.float32)
    fwd = jax.jit(functools.partial(stylize_arbitrary, precision=prec))

    def chain_once(k):
        t0 = time.perf_counter()
        r = x0
        for _ in range(k):
            r = fwd(dec, vgg, r, style)
        float(jnp.sum(r))
        return (time.perf_counter() - t0) * 1000.0

    chain_once(2)
    rtt = _rtt(3)
    med = [max(chain_once(chain) - rtt, 1e-6) / chain for _ in range(samples)]
    return float(np.percentile(med, 50))


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "train"
    vals = [int(v) for v in sys.argv[2:]] or ([8, 32, 96] if mode == "train"
                                              else [256, 512])
    print(f"device: {jax.devices()[0].platform}")
    if mode == "train":
        for b in vals:
            ms = train_step_ms(b)
            print(f"adain train b{b} bf16 256^2: {ms:.2f} ms/step "
                  f"= {b / (ms / 1000.0):.1f} img/s/chip")
    else:
        for hw in vals:
            ms = infer_ms(hw)
            print(f"adain infer {hw}^2 bf16: {ms:.2f} ms p50")


if __name__ == "__main__":
    main()
