"""AdaIN decoder training: the jitted step and the orchestration loop.

Trains the arbitrary-style decoder (models/adain.py) per Huang & Belongie
2017 §6: content batches and style batches stream independently, each step
pairs them, and the loss is

    L = ||f(g(t)) - t||^2  +  lambda * sum_taps ( ||mu - mu_s||^2
                                                 + ||sigma - sigma_s||^2 )

with f = frozen VGG19 to relu4_1, t = AdaIN(f(content), f(style)), g = the
decoder, stats over the paper's four taps (relu1_1..relu4_1), mean-MSE
reductions, Adam lr 1e-4. Same TPU shape as the main trainer
(train/step.py): the whole iteration is one XLA program; a batch sharded
over the mesh's data axis trains data-parallel with XLA's implicit gradient
psum; non-finite losses skip the update branch-free; checkpointing is the
same Orbax manager.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fast_neural_style_transfer_tpu.core.dtypes import Precision, canonical_compute_dtype
from fast_neural_style_transfer_tpu.models.adain import (
    AdaINDecoder,
    STYLE_TAPS,
    adain,
    channel_stats,
)
from fast_neural_style_transfer_tpu.models.vgg import VGG19Features
from fast_neural_style_transfer_tpu.train.state import TrainState, create_train_state
from fast_neural_style_transfer_tpu.train.step import normalize_u8_batch


def adain_loss_fn(
    decoder_params: Any,
    vgg_params: Any,
    content: jnp.ndarray,
    style: jnp.ndarray,
    style_weight: jnp.ndarray,
    *,
    precision: Precision,
    remat: bool = False,
):
    """(total, metrics) for one (content batch, style batch) pair.

    ``remat``: rematerialize the two gradient-bearing forwards — the
    decoder and the VGG encode of its output — in the backward pass
    (``jax.checkpoint``; identical math, ~+1 forward of step time, frees
    the peak activation memory that bounds batch per chip). The content
    and style encodes carry no decoder gradient, so XLA stores nothing for
    them either way."""
    # No stop_gradient anywhere: the grad is taken w.r.t. decoder_params
    # only (make_adain_train_step differentiates the first argument), and
    # none of the encoder features depend on it — t is the decoder's INPUT,
    # fully computed before decoder_params is touched.
    content = normalize_u8_batch(content)
    style = normalize_u8_batch(style)

    (c_feat,) = VGG19Features.apply(
        vgg_params, content, (STYLE_TAPS[-1],), precision=precision
    )
    s_feats = VGG19Features.apply(vgg_params, style, STYLE_TAPS,
                                  precision=precision)

    t = adain(c_feat, s_feats[-1])

    def dec_fwd(p, v):
        return AdaINDecoder.apply(p, v, precision=precision)

    def enc_fwd(vp, v):
        return VGG19Features.apply(vp, v, STYLE_TAPS, precision=precision)

    if remat:
        dec_fwd = jax.checkpoint(dec_fwd)
        enc_fwd = jax.checkpoint(enc_fwd)
    img = dec_fwd(decoder_params, t)
    o_feats = enc_fwd(vgg_params, img)

    # content: mean-MSE against the AdaIN target (paper eq. 12 — against t,
    # not the raw content feature)
    diff = o_feats[-1].astype(jnp.float32) - t.astype(jnp.float32)
    c_loss = jnp.mean(jnp.square(diff))

    # style: channel mean/std alignment at every tap (paper eq. 13)
    s_loss = jnp.asarray(0.0, jnp.float32)
    for o, s in zip(o_feats, s_feats):
        mu_o, sd_o = channel_stats(o)
        mu_s, sd_s = channel_stats(s)
        s_loss = s_loss + jnp.mean(jnp.square(mu_o - mu_s))
        s_loss = s_loss + jnp.mean(jnp.square(sd_o - sd_s))

    total = c_loss + style_weight * s_loss
    return total, {
        "loss": total,
        "content_loss": c_loss,
        "style_loss": s_loss,
    }


def lr_decay_factor(decay: float, step):
    """The AdaIN paper's inverse-time decay as a multiplier on the base lr:
    ``1 / (1 + decay * step)``. Applied to the UPDATES (Adam's step
    magnitude is proportional to lr, so scaling updates by f is exactly
    lr*f) rather than as an optax schedule — adam(callable) stores a
    different opt_state pytree than adam(float), which would break
    restoring checkpoints written before the decay existed. ``step`` is the
    TrainState's applied-update count, so a restored run resumes at the
    exact schedule position; decay=0 is constant lr."""
    return 1.0 / (1.0 + decay * step)


def make_adain_train_step(
    optimizer: optax.GradientTransformation,
    *,
    style_weight: float = 10.0,
    precision: Precision = Precision.f32(),
    donate: bool = True,
    lr_decay: float = 0.0,
    remat: bool = False,
) -> Callable:
    """Jitted ``step(state, vgg_params, content, style) -> (state, metrics)``.

    Same robustness contract as the main trainer: a non-finite loss reverts
    params, optimizer state, AND the step counter (branch-free select)."""
    sw = jnp.asarray(style_weight, jnp.float32)

    def step_fn(state: TrainState, vgg_params, content, style):
        grads, metrics = jax.grad(
            lambda p: adain_loss_fn(p, vgg_params, content, style, sw,
                                    precision=precision, remat=remat),
            has_aux=True,
        )(state.params)
        updates, new_opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
        if lr_decay:
            scale = lr_decay_factor(lr_decay, state.step).astype(jnp.float32)
            updates = jax.tree.map(
                lambda u: (u * scale).astype(u.dtype), updates)
        new_params = optax.apply_updates(state.params, updates)
        finite = jnp.isfinite(metrics["loss"])
        select = lambda new, old: jax.tree.map(
            lambda n, o: jnp.where(finite, n, o), new, old
        )
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        metrics["skipped_nonfinite"] = (~finite).astype(jnp.float32)
        return (
            TrainState(
                params=select(new_params, state.params),
                opt_state=select(new_opt_state, state.opt_state),
                step=state.step + finite.astype(state.step.dtype),
            ),
            metrics,
        )

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


@dataclasses.dataclass
class AdaINTrainConfig:
    content_dir: str
    style_dir: str
    output_dir: str = "adain_output"
    vgg_weights: Optional[str] = None

    total_steps: int = 20_000
    batch_size: int = 8
    lr: float = 1e-4
    # paper recipe (official implementation): lr / (1 + decay * step) as a
    # pure function of the applied-update count (see lr_decay_factor — the
    # decay multiplies the updates so pre-decay checkpoints stay
    # restorable). 0 disables.
    lr_decay: float = 5e-5
    style_weight: float = 10.0
    # jax.checkpoint the decoder + output-VGG forwards (see adain_loss_fn)
    remat: bool = False
    image_size: Tuple[int, int] = (256, 256)
    precision: str = "f32"
    seed: int = 0
    num_workers: int = 8

    log_every: int = 100
    checkpoint_every: int = 2000
    resume: bool = True
    max_checkpoints: int = 3


def train_adain(cfg: AdaINTrainConfig) -> str:
    """Train the arbitrary-style decoder; returns the final .npz path."""
    from fast_neural_style_transfer_tpu.data import ImageFolderDataset, InputPipeline
    from fast_neural_style_transfer_tpu.models.vgg_weights import resolve_params
    from fast_neural_style_transfer_tpu.parallel import make_mesh_plan
    from fast_neural_style_transfer_tpu.train.checkpoint import (
        CheckpointManager,
        save_params_npz,
    )
    from fast_neural_style_transfer_tpu.train.state import replicate_state
    from fast_neural_style_transfer_tpu.utils import MetricLogger

    os.makedirs(cfg.output_dir, exist_ok=True)
    if cfg.image_size[0] % 8 or cfg.image_size[1] % 8:
        raise ValueError(
            f"image_size {cfg.image_size} must be a multiple of 8 (three VGG "
            "pools down, three x2 decoder ups back)"
        )
    prec = canonical_compute_dtype(cfg.precision)
    plan = make_mesh_plan()
    plan.check_batch(cfg.batch_size)

    vgg_params = jax.device_put(
        resolve_params(cfg.vgg_weights, seed=cfg.seed), plan.replicated
    )
    optimizer = optax.adam(cfg.lr)
    state = create_train_state(AdaINDecoder.init(jax.random.PRNGKey(cfg.seed)),
                               optimizer)
    state = replicate_state(state, plan.replicated)

    ckpt = CheckpointManager(os.path.join(cfg.output_dir, "checkpoints"),
                             max_to_keep=cfg.max_checkpoints)
    # Resume the LOOP counter from the checkpoint label, not state.step:
    # non-finite skipped iterations advance the loop (and therefore the
    # label) but not state.step, and Orbax refuses to re-save an existing
    # label — resuming at state.step would re-reach and re-save it.
    resume_label = None
    if cfg.resume and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        resume_label = ckpt.latest_step()
        print(
            f"resumed AdaIN decoder from checkpoint {resume_label} "
            f"(optimizer step {int(state.step)})",
            flush=True,
        )

    step = make_adain_train_step(optimizer, lr_decay=cfg.lr_decay,
                                 style_weight=cfg.style_weight,
                                 precision=prec, remat=cfg.remat)

    # two independent streams; different seeds decorrelate the pairing
    content_pipe = InputPipeline(
        ImageFolderDataset(cfg.content_dir, cfg.image_size, seed=cfg.seed),
        cfg.batch_size, seed=cfg.seed, num_workers=cfg.num_workers,
        sharding=plan.batch_sharding,
    )
    style_pipe = InputPipeline(
        ImageFolderDataset(cfg.style_dir, cfg.image_size, seed=cfg.seed + 7),
        cfg.batch_size, seed=cfg.seed + 7, num_workers=cfg.num_workers,
        sharding=plan.batch_sharding,
    )

    logger = MetricLogger(os.path.join(cfg.output_dir, "metrics.jsonl"),
                          print_every=cfg.log_every)
    start = int(state.step) if resume_label is None else resume_label
    n = start
    t0 = time.perf_counter()

    # Preemption handling, same contract as the main trainer
    # (train/loop.py): TPU VMs get SIGTERM before eviction — finish the
    # in-flight step, then the finally block persists a restorable
    # checkpoint. Installed only on the main thread; restored after.
    import signal
    import threading

    stop_requested = threading.Event()
    handler_installed = False
    prev_handler = None
    if threading.current_thread() is threading.main_thread():
        def _on_sigterm(signum, frame):
            print("SIGTERM received: checkpointing and stopping", flush=True)
            stop_requested.set()

        prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)
        handler_installed = True

    try:
        for content, style in zip(content_pipe.device_batches(),
                                  style_pipe.device_batches()):
            if n >= cfg.total_steps or stop_requested.is_set():
                break
            state, metrics = step(state, vgg_params, content, style)
            n += 1
            logger.update(metrics)
            if logger.should_log(n):
                logger.flush(n)
            if n % cfg.checkpoint_every == 0:
                ckpt.save(n, state)
                print(f"AdaIN checkpoint saved at step {n}", flush=True)
    finally:
        # Each cleanup step is isolated (train/loop.py contract): a
        # device-side failure resurfaces in flush's D2H fetches — and with
        # donate_argnums=(0,) a failed step leaves `state` on donated
        # buffers — and neither must mask the original exception or abort
        # the cleanup steps behind it.
        def _cleanup(what, fn):
            try:
                fn()
            except Exception as e:
                print(f"cleanup: {what} failed: {e!r}", flush=True)

        if logger.pending:
            _cleanup("metrics flush", lambda: logger.flush(n))
        if n > start and ckpt.latest_step() != n:
            _cleanup("final checkpoint", lambda: ckpt.save(n, state))
        _cleanup("checkpoint wait", ckpt.wait)
        _cleanup("logger close", logger.close)
        _cleanup("checkpoint close", ckpt.close)
        if handler_installed:
            signal.signal(signal.SIGTERM, prev_handler or signal.SIG_DFL)

    wall = time.perf_counter() - t0
    if n:
        print(f"AdaIN: trained to step {n} in {wall:.1f}s", flush=True)
    try:  # loss-curve PNGs, same contract as the main loop (train/loop.py)
        from fast_neural_style_transfer_tpu.utils.visualization import (
            plot_loss_curves,
        )

        plot_loss_curves(os.path.join(cfg.output_dir, "metrics.jsonl"),
                         cfg.output_dir,
                         curves=("loss", "content_loss", "style_loss"))
    except Exception as e:  # plotting must never fail a training run
        print(f"loss-curve plotting skipped: {e}", flush=True)
    final = os.path.join(cfg.output_dir, "adain_decoder_final.npz")
    save_params_npz(jax.device_get(state.params), final)
    print(f"AdaIN decoder saved to {final}", flush=True)
    return final
