#!/usr/bin/env python
"""Chip A/B for --pad_batch: step time b20 plain vs b20-padded-to-24 vs b24.

DESIGN.md §8 measured that XLA pads a b20 step's conv layouts to 24 and
computes on the pad anyway (b24 = +3.6% wall for +20% images). --pad_batch
claims that throughput with exact b20 gradients (tests/test_pad_batch.py);
this probe measures what the padded step actually costs on the chip next to
the hostile shape it replaces. Chained-fetch method (bench.py): k
data-dependent steps per wall sample, one scalar D2H.

    python tools/probe_pad_batch.py            # b20 on v5e, bf16 256^2
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from fast_neural_style_transfer_tpu.cli import enable_compilation_cache

enable_compilation_cache()  # three train-step compiles dominate otherwise


def _measure(step, state, args, iters, samples):
    t0 = time.perf_counter()
    state2, m = step(state, *args)
    _ = float(m["loss"])  # force D2H; tunnel block_until_ready lies
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(samples):
        s = state
        t0 = time.perf_counter()
        for _ in range(iters):
            s, m = step(s, *args)
        _ = float(m["loss"])
        ts.append((time.perf_counter() - t0) / iters * 1000.0)
    return float(np.median(ts)), compile_s


def build(batch, hw, prec, mask, iters, samples):
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
    step = make_train_step(opt, taps=taps, precision=p, donate=False)
    x = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (batch, hw, hw, 3)), jnp.uint8)
    args = (vgg, x, grams, jax.random.PRNGKey(2))
    if mask is not None:
        args = args + (jnp.asarray(mask),)
    return _measure(step, state, args, iters, samples)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=20,
                    help="the hostile (real) batch")
    ap.add_argument("--precision", default="bf16")
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--samples", type=int, default=3)
    args = ap.parse_args()

    b = args.batch
    padded = -(-b // 8) * 8
    mask = np.concatenate([np.ones(b, np.float32),
                           np.zeros(padded - b, np.float32)])
    rec = {"device": jax.devices()[0].platform, "precision": args.precision,
           "image_size": args.image_size, "batch": b, "padded": padded}
    for key, bsz, m in ((f"step_ms_b{b}", b, None),
                        (f"step_ms_b{padded}_masked", padded, mask),
                        (f"step_ms_b{padded}", padded, None)):
        try:
            ms, compile_s = build(bsz, args.image_size, args.precision, m,
                                  args.iters, args.samples)
            rec[key] = round(ms, 3)
            # hostile shapes are also hostile to COMPILE: measured r4,
            # b20 bf16 256^2 takes ~492 s to compile on this backend vs
            # ~48 s for b24 — record it, it can dominate short runs
            rec[key + "_compile_s"] = round(compile_s, 1)
        except Exception as e:
            rec[key + "_error"] = f"{type(e).__name__}: {e}"[:200]
    kb, kp = f"step_ms_b{b}", f"step_ms_b{padded}_masked"
    if kb in rec and kp in rec:
        rec["padded_overhead_pct"] = round(
            100.0 * (rec[kp] / rec[kb] - 1.0), 1)
        rec["imgs_per_sec_plain"] = round(b / rec[kb] * 1000.0, 1)
        rec["imgs_per_sec_padded"] = round(b / rec[kp] * 1000.0, 1)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
