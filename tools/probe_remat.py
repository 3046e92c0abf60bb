#!/usr/bin/env python
"""Chip datapoint for --remat: step time with vs without, same shapes.

The CPU equivalence tests prove remat changes nothing numerically; this
measures what it costs (expected: ~+1 forward) so DESIGN.md can quote the
real trade next to memory_probe.py's byte counts. Chained-fetch method
(bench.py): k data-dependent steps per wall sample, one scalar D2H.

    python tools/probe_remat.py 20 96          # flagship batches
    python tools/probe_remat.py 8 32 --family adain
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
import optax


def _measure(step, state, args, iters, samples):
    # warm + compile
    state2, m = step(state, *args)
    jax.block_until_ready(state2)
    ts = []
    for _ in range(samples):
        s = state
        t0 = time.perf_counter()
        for _ in range(iters):
            s, m = step(s, *args)
        _ = float(m["loss"])  # force D2H; tunnel block_until_ready lies
        ts.append((time.perf_counter() - t0) / iters * 1000.0)
    return float(np.median(ts))


def flagship(batch, hw, prec, remat, iters, samples):
    from fast_neural_style_transfer_tpu.core.dtypes import canonical_compute_dtype
    from fast_neural_style_transfer_tpu.losses import (
        LossTaps,
        style_targets_from_features,
    )
    from fast_neural_style_transfer_tpu.models import (
        TransformerNet,
        VGG19Features,
    )
    from fast_neural_style_transfer_tpu.train.state import (
        create_train_state,
        make_optimizer,
    )
    from fast_neural_style_transfer_tpu.train.step import make_train_step

    p = canonical_compute_dtype(prec)
    taps = LossTaps()
    vgg = VGG19Features.init(jax.random.PRNGKey(0))
    grams = tuple(style_targets_from_features(VGG19Features.apply(
        vgg, jnp.zeros((1, hw, hw, 3), jnp.float32), taps.style_taps)))
    opt = make_optimizer(1e-3, 1000)
    state = create_train_state(TransformerNet.init(jax.random.PRNGKey(1)), opt)
    step = make_train_step(opt, taps=taps, precision=p, remat=remat,
                           donate=False)
    x = jnp.zeros((batch, hw, hw, 3), jnp.uint8)
    return _measure(step, state, (vgg, x, grams, jax.random.PRNGKey(2)),
                    iters, samples)


def adain(batch, hw, prec, remat, iters, samples):
    from fast_neural_style_transfer_tpu.core.dtypes import canonical_compute_dtype
    from fast_neural_style_transfer_tpu.models.adain import AdaINDecoder
    from fast_neural_style_transfer_tpu.models.vgg import VGG19Features
    from fast_neural_style_transfer_tpu.train.adain import make_adain_train_step
    from fast_neural_style_transfer_tpu.train.state import create_train_state

    p = canonical_compute_dtype(prec)
    vgg = VGG19Features.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-4)
    state = create_train_state(AdaINDecoder.init(jax.random.PRNGKey(1)), opt)
    step = make_adain_train_step(opt, precision=p, remat=remat, donate=False)
    x = jnp.zeros((batch, hw, hw, 3), jnp.uint8)
    return _measure(step, state, (vgg, x, x), iters, samples)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("batches", type=int, nargs="+")
    ap.add_argument("--family", choices=("flagship", "adain"),
                    default="flagship")
    ap.add_argument("--precision", default="bf16")
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--samples", type=int, default=3)
    args = ap.parse_args()
    build = adain if args.family == "adain" else flagship
    dev = jax.devices()[0].platform
    for b in args.batches:
        rec = {"family": args.family, "batch": b, "device": dev,
               "precision": args.precision, "image_size": args.image_size}
        for remat in (False, True):
            key = "step_ms_remat" if remat else "step_ms"
            try:
                rec[key] = round(build(b, args.image_size, args.precision,
                                       remat, args.iters, args.samples), 3)
            except Exception as e:
                rec[key + "_error"] = f"{type(e).__name__}: {e}"[:200]
        if "step_ms" in rec and "step_ms_remat" in rec:
            rec["remat_overhead_pct"] = round(
                100.0 * (rec["step_ms_remat"] / rec["step_ms"] - 1.0), 1)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
