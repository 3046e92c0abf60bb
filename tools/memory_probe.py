#!/usr/bin/env python
"""Compiled-program memory report: what bounds the max batch per chip.

Compiles (never runs) the flagship or AdaIN train step at the requested
batch shapes, with and without rematerialization, and prints XLA's own
memory analysis (``compiled.memory_analysis()``) — the number that decides
whether a shape OOMs before any step executes. This is how ``--remat``'s
trade is quantified: temp (activation) bytes down, FLOPs up ~one forward.

    python tools/memory_probe.py 20 96 192            # flagship, f32
    python tools/memory_probe.py 8 32 --family adain
    python tools/memory_probe.py 96 --precision bf16 --image_size 256

Runs on whatever backend jax picks (the attached TPU when up — those are
the numbers that matter; CPU estimates structure but not the TPU layouts).
One JSON line per (batch, remat) combination.
"""
import argparse
import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import optax


def _analysis_dict(compiled) -> dict:
    m = compiled.memory_analysis()
    if m is None:  # backend without the C++ analysis: report nothing
        return {}
    keys = (
        "temp_size_in_bytes",        # activations + workspace: remat's target
        "argument_size_in_bytes",
        "output_size_in_bytes",
        "alias_size_in_bytes",
        "generated_code_size_in_bytes",
    )
    return {k: int(getattr(m, k)) for k in keys if hasattr(m, k)}


def flagship(batch: int, hw: int, precision, remat: bool) -> dict:
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

    taps = LossTaps()
    vgg = VGG19Features.init(jax.random.PRNGKey(0))
    grams = tuple(style_targets_from_features(VGG19Features.apply(
        vgg, jnp.zeros((1, hw, hw, 3), jnp.float32), taps.style_taps)))
    opt = make_optimizer(1e-3, 100)
    state = create_train_state(TransformerNet.init(jax.random.PRNGKey(1)), opt)
    step = make_train_step(opt, taps=taps, precision=precision, remat=remat,
                           donate=True)
    batch_x = jnp.zeros((batch, hw, hw, 3), jnp.uint8)
    compiled = step.lower(state, vgg, batch_x, grams,
                          jax.random.PRNGKey(2)).compile()
    return _analysis_dict(compiled)


def adain(batch: int, hw: int, precision, remat: bool) -> dict:
    from fast_neural_style_transfer_tpu.models.adain import AdaINDecoder
    from fast_neural_style_transfer_tpu.models.vgg import VGG19Features
    from fast_neural_style_transfer_tpu.train.adain import (
        make_adain_train_step,
    )
    from fast_neural_style_transfer_tpu.train.state import create_train_state

    vgg = VGG19Features.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-4)
    state = create_train_state(AdaINDecoder.init(jax.random.PRNGKey(1)), opt)
    step = make_adain_train_step(opt, precision=precision, remat=remat,
                                 donate=True)
    x = jnp.zeros((batch, hw, hw, 3), jnp.uint8)
    compiled = step.lower(state, vgg, x, x).compile()
    return _analysis_dict(compiled)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("batches", type=int, nargs="+")
    ap.add_argument("--family", choices=("flagship", "adain"),
                    default="flagship")
    ap.add_argument("--precision", choices=("f32", "bf16"), default="f32")
    ap.add_argument("--image_size", type=int, default=256)
    args = ap.parse_args()

    from fast_neural_style_transfer_tpu.core.dtypes import Precision

    prec = Precision.bf16() if args.precision == "bf16" else Precision.f32()
    build = adain if args.family == "adain" else flagship
    dev = jax.devices()[0].platform
    for b in args.batches:
        for remat in (False, True):
            rec = {"family": args.family, "batch": b,
                   "image_size": args.image_size,
                   "precision": args.precision, "remat": remat,
                   "device": dev}
            try:
                rec.update(build(b, args.image_size, prec, remat))
            except Exception as e:  # OOM at compile time is itself the answer
                rec["error"] = f"{type(e).__name__}: {e}"[:200]
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
