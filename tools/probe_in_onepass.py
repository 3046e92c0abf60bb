#!/usr/bin/env python
"""Chip A/B: one-pass IN statistics (var = E[x²] - mean²) vs the stable
two-pass default, in the FULL train step (DESIGN.md §8's rule: isolated op
probes disagree with in-context traces).

Motivation: the round-2 xprof hunt measured the IN stat reductions as
HBM-bound (~7.2 ms of the 89 ms b20 step at 60 GB/s); the stable variance
re-reads the activation after the mean is known, while E[x²] shares one
read with the mean via XLA multi-output reduce fusion. Candidate for the
round-5 "one more measured perf attempt" (VERDICT r4 #3).

    python tools/probe_in_onepass.py 20 96
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def build_step(batch, hw, prec, norm_method):
    from fast_neural_style_transfer_tpu.core.dtypes import canonical_compute_dtype
    from fast_neural_style_transfer_tpu.losses import (
        LossTaps,
        style_targets_from_features,
    )
    from fast_neural_style_transfer_tpu.models import TransformerNet, VGG19Features
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
    step = make_train_step(opt, taps=taps, precision=p, donate=False,
                           norm_method=norm_method)
    x = jnp.zeros((batch, hw, hw, 3), jnp.uint8)
    return step, state, (vgg, x, grams, jax.random.PRNGKey(2))


def measure(batch, hw, prec, iters, samples, norm_method="auto"):
    step, state, args = build_step(batch, hw, prec, norm_method)
    state2, m = step(state, *args)
    float(m["loss"])  # compile + warm; forced D2H (tunnel block lies)
    ts = []
    for _ in range(samples):
        s = state
        t0 = time.perf_counter()
        for _ in range(iters):
            s, m = step(s, *args)
        _ = float(m["loss"])
        ts.append((time.perf_counter() - t0) / iters * 1000.0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("batches", type=int, nargs="+")
    ap.add_argument("--precision", default="bf16")
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--samples", type=int, default=3)
    args = ap.parse_args()
    dev = jax.devices()[0].platform
    for b in args.batches:
        rec = {"batch": b, "device": dev, "precision": args.precision,
               "image_size": args.image_size}
        # interleave: baseline, variant, baseline again (re-baseline
        # in-session — chip/session variance, DESIGN.md §8)
        for key, method in (("step_ms_stable", "auto"),
                            ("step_ms_onepass", "onepass"),
                            ("step_ms_stable2", "auto")):
            try:
                rec[key] = round(measure(b, args.image_size, args.precision,
                                         args.iters, args.samples, method), 3)
            except Exception as e:
                rec[key + "_error"] = f"{type(e).__name__}: {e}"[:200]
        if "step_ms_stable" in rec and "step_ms_onepass" in rec:
            base = min(rec["step_ms_stable"], rec.get("step_ms_stable2",
                                                      rec["step_ms_stable"]))
            rec["onepass_delta_pct"] = round(
                100.0 * (rec["step_ms_onepass"] / base - 1.0), 2)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
