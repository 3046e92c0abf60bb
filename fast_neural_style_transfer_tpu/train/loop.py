"""Training orchestration — the rebuild of /root/reference/train.py:68-302.

Same capabilities, TPU-shaped: one jitted SPMD train step over a device mesh,
host input pipeline prefetching into it, and the reference's cadences kept —
log every 100 iters (train.py:217-234), monitor sample every 1000
(train.py:242-266), checkpoint every 5000 (train.py:269-283), final artifact
save at the end (train.py:295-301). The loop is step-bounded like the
reference's (its ``num_epochs`` arg was dead — defect ledger, SURVEY.md §2.3).
"""

from __future__ import annotations

import dataclasses
import os
import signal
import threading
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fast_neural_style_transfer_tpu.core.dtypes import Precision, canonical_compute_dtype
from fast_neural_style_transfer_tpu.data import ImageFolderDataset, InputPipeline
from fast_neural_style_transfer_tpu.losses import LossTaps, style_targets_from_features
from fast_neural_style_transfer_tpu.models import TransformerNet, VGG19Features
from fast_neural_style_transfer_tpu.models.vgg_weights import resolve_params
from fast_neural_style_transfer_tpu.parallel import make_mesh_plan
from fast_neural_style_transfer_tpu.train.checkpoint import CheckpointManager, save_params_npz
from fast_neural_style_transfer_tpu.train.schedule import LossWeightSchedule
from fast_neural_style_transfer_tpu.train.state import (
    create_train_state,
    make_optimizer,
    replicate_state,
)
from fast_neural_style_transfer_tpu.train.step import make_eval_forward, make_train_step
from fast_neural_style_transfer_tpu.utils import MetricLogger, load_image, save_image


@dataclasses.dataclass
class TrainConfig:
    """Flag-parity superset of the reference CLI (begin_training.py:12-26).

    ``style_image`` may be a single path (the reference's one-net-per-style
    regime) or a sequence of paths — the latter trains ONE net on all S
    styles via conditional instance norm (models/transformer.py): per-style
    (S, C) IN affine banks, shared convs, per-example style sampling in the
    train step. Inference selects/blends styles with ``Stylizer``'s
    ``style=`` argument (which bakes back to a standard single-style net).
    """

    style_image: "str | Tuple[str, ...]"
    dataset_dir: str
    output_dir: str = "training_output"
    vgg_weights: Optional[str] = None
    monitor_image: Optional[str] = None

    total_steps: int = 80_000
    # optional additional bound: stop after N dataset epochs (the reference
    # accepted --num_epochs but ignored it — defect ledger; None = unbounded)
    num_epochs: Optional[int] = None
    batch_size: int = 20  # GLOBAL batch (split over the data mesh axis)
    lr: float = 1e-3
    image_size: Tuple[int, int] = (256, 256)

    content_weight: float = 1000.0
    style_weight: float = 1.0
    tv_weight: float = 10.0
    weight_decay_every: int = 10_000  # 0 disables the halving/doubling schedule
    grad_accum: int = 1  # micro-batches averaged per optimizer update
    # pad TPU-hostile per-chip batches (e.g. the reference's b20) up to the
    # next multiple of 8 with loss-masked dummy images. Gradients stay
    # exactly the real batch's; the measured value is avoiding the
    # hostile-shape COMPILE cliff (b20: 223-492 s vs ~7 s padded), not
    # throughput (b20->b24 measured -3.5% img/s — train at real multiples
    # of 8 when throughput matters; DESIGN.md §8 addendum)
    pad_batch: bool = False
    # rematerialize the stylizer + stylized-VGG forwards in the backward
    # (jax.checkpoint): ~+1 forward of step time buys back the peak
    # activation memory that bounds max batch / image size per chip
    remat: bool = False
    # IN statistic lowering: "stable" (two-pass variance around the mean —
    # torch-exact, what the lockstep parity was proven with) or "onepass"
    # (var = E[x²] - mean², one HBM pass for both stat reductions: measured
    # -2.1% b20 / -3.3% b96 step time on v5e, evidence/in_onepass_r5.jsonl;
    # numerically equivalent except channels with var << mean²)
    in_stats: str = "stable"

    content_tap: str = "relu4_2"  # the reference *intended* relu4_2 (config.py:18)
    style_taps: Tuple[str, ...] = ("relu1_2", "relu2_2", "relu3_3")
    style_tap_weights: Tuple[float, ...] = (0.25, 0.3, 0.45)

    precision: str = "f32"
    seed: int = 0
    num_workers: int = 8
    # >1 shards image HEIGHT over that many chips (high-res training via
    # train/spatial_step.py); remaining chips form the data axis
    spatial: int = 1

    log_every: int = 100
    monitor_every: int = 1000
    checkpoint_every: int = 5000
    resume: bool = True
    max_checkpoints: int = 3
    # warm-start stylizer params from a file (.npz or reference .pth) — the
    # reference CLI's --checkpoint_path (begin_training.py:25)
    init_checkpoint: Optional[str] = None

    # profiling (SURVEY.md §5.1): trace steps [start, stop) into
    # <output_dir>/profile for TensorBoard/xprof
    profile_start: int = 0
    profile_stop: int = 0


def train_style_transfer(cfg: TrainConfig) -> str:
    """Run training; returns the path of the final params artifact."""
    os.makedirs(cfg.output_dir, exist_ok=True)
    if cfg.image_size[0] % 4 or cfg.image_size[1] % 4:
        # the stylizer's two stride-2 encoder convs ceil and the decoder x4s,
        # so non-multiple-of-4 training sizes come back at a different
        # resolution than the content batch: either an opaque shape error
        # inside jit (odd sizes) or, worse, silently misregistered content
        # features (e.g. 250 -> 252). Refuse early with the reason.
        raise ValueError(
            f"image_size {cfg.image_size} must be a multiple of 4 in both "
            "dims (stylizer downsamples 4x and upsamples back)"
        )
    if cfg.in_stats not in ("stable", "onepass"):
        raise ValueError(
            f"in_stats must be 'stable' or 'onepass', got {cfg.in_stats!r}")
    if cfg.in_stats == "onepass" and cfg.spatial > 1:
        # the H-sharded step computes its global IN statistics through its
        # own psum two-pass lowering (ops/sharded.py); a one-pass variant
        # there would be a separate change
        raise ValueError("in_stats='onepass' is not supported with spatial "
                         "sharding (spatial > 1)")
    prec = canonical_compute_dtype(cfg.precision)
    taps = LossTaps(
        style_taps=tuple(cfg.style_taps),
        style_weights=tuple(cfg.style_tap_weights),
        content_tap=cfg.content_tap,
    )

    if cfg.spatial > 1:
        n_dev = len(jax.devices())
        if n_dev % cfg.spatial:
            raise ValueError(
                f"spatial={cfg.spatial} must divide the {n_dev} devices; "
                "remaining devices form the data axis"
            )
        if cfg.image_size[0] % (8 * cfg.spatial):
            raise ValueError(
                f"image height {cfg.image_size[0]} must divide 8 * spatial "
                f"({8 * cfg.spatial}): stylizer needs 4, VGG's pools need 8 "
                "rows per shard"
            )
        plan = make_mesh_plan(spatial=cfg.spatial)
        plan.check_batch(cfg.batch_size)  # batch splits over the data axis
    else:
        plan = make_mesh_plan()
        plan.check_batch(cfg.batch_size)
    print(
        f"mesh: {plan.mesh.shape} over {len(plan.mesh.devices.flat)} "
        f"{plan.mesh.devices.flat[0].platform} device(s); "
        f"global batch {cfg.batch_size}",
        flush=True,
    )
    per_chip = cfg.batch_size // max(plan.num_data_shards, 1)
    pad_batch_active = bool(cfg.pad_batch) and per_chip % 8 != 0
    if pad_batch_active and cfg.spatial > 1:
        raise ValueError(
            "--pad_batch is not supported with --spatial height sharding "
            "(the halo-exchange step has no batch-mask plumbing); choose a "
            "per-chip batch that is a multiple of 8 instead"
        )
    if per_chip % 8 and not pad_batch_active:
        # the reference default (config.py:4 BATCH_SIZE=20) is a hostile
        # shape on TPU — warn whatever backend we're on, since configs are
        # usually authored on CPU dev boxes and deployed to chips
        print(
            f"note: per-chip batch {per_chip} is not a multiple of 8 — a "
            "hostile shape on TPU (measured on v5e: b24 is +3.5% wall for "
            "+20% images over b20, and the b20 train step costs ~10x the "
            "XLA compile time: 492s vs 48s; DESIGN.md §8). Prefer REAL "
            "batch multiples of 8/chip, ideally >=64/chip; --pad_batch "
            "keeps this exact batch's gradients while compiling at the "
            "friendly padded shape (+3.7% step wall).",
            flush=True,
        )
    elif pad_batch_active:
        padded_chip = -(-per_chip // 8) * 8
        print(
            f"pad_batch: per-chip batch {per_chip} -> {padded_chip} "
            f"(loss-masked padding; gradients are exact b{cfg.batch_size}, "
            "step wall is the padded shape's, compile avoids the "
            "hostile-shape cliff — DESIGN.md §8)",
            flush=True,
        )

    # frozen VGG19 + one-time style Gram targets (reference train.py:86-89,110-118)
    vgg_params = resolve_params(cfg.vgg_weights, seed=cfg.seed)
    vgg_params = jax.device_put(vgg_params, plan.replicated)
    style_paths = ([cfg.style_image] if isinstance(cfg.style_image, str)
                   else list(cfg.style_image))
    num_styles = len(style_paths)
    if num_styles > 1 and cfg.spatial > 1:
        raise ValueError(
            "multi-style training and --spatial height sharding cannot be "
            "combined yet (the halo-exchange step is single-style)"
        )
    per_style_targets = []
    for sp in style_paths:
        style_img = load_image(sp, cfg.image_size)
        style_feats = VGG19Features.apply(
            vgg_params, jnp.asarray(style_img), taps.style_taps, precision=prec
        )
        per_style_targets.append(style_targets_from_features(style_feats))
    if num_styles == 1:
        layer_targets = per_style_targets[0]
    else:  # per-layer (S, c, c) banks for per-example selection in the step
        layer_targets = [jnp.stack(layer) for layer in zip(*per_style_targets)]
        print(f"multi-style run: {num_styles} styles via conditional IN",
              flush=True)
    style_grams = tuple(
        jax.device_put(g, plan.replicated) for g in layer_targets
    )

    # stylizer + optimizer state, replicated over the mesh
    optimizer = make_optimizer(cfg.lr, cfg.total_steps, grad_accum=cfg.grad_accum)
    params = TransformerNet.init(jax.random.PRNGKey(cfg.seed), num_styles=num_styles)
    state = None
    if cfg.init_checkpoint:
        # A reference TRAINING checkpoint (.pth with optimizer_state_dict,
        # /root/reference/train.py:269-283) resumes fully: params + Adam
        # moments + bias-correction count + schedule position + iteration.
        # Anything else (.npz, bare state_dict .pth) warm-starts params only.
        from fast_neural_style_transfer_tpu.export.torch_convert import (
            is_torch_training_checkpoint,
        )

        if is_torch_training_checkpoint(cfg.init_checkpoint):
            if num_styles > 1:
                # the reference .pth layout is single-style by definition;
                # fail here with the reason instead of a trace-time
                # style_weights error after VGG/gram/mesh setup
                raise ValueError(
                    f"cannot resume a reference training checkpoint into a "
                    f"{num_styles}-style run: reference checkpoints are "
                    "single-style"
                )
            from fast_neural_style_transfer_tpu.train.state import (
                state_from_reference_checkpoint,
            )

            state = state_from_reference_checkpoint(
                cfg.init_checkpoint, optimizer, grad_accum=cfg.grad_accum
            )
            print(
                f"fully resumed reference training checkpoint "
                f"{cfg.init_checkpoint} at iteration {int(state.step)}",
                flush=True,
            )
        else:
            from fast_neural_style_transfer_tpu.infer.stylize import Stylizer
            from fast_neural_style_transfer_tpu.models.transformer import (
                num_styles as params_num_styles,
            )

            loaded = Stylizer.load_params(cfg.init_checkpoint)
            if params_num_styles(loaded) != num_styles:
                raise ValueError(
                    f"init_checkpoint has {params_num_styles(loaded)} "
                    f"style(s) but this run trains {num_styles} — style "
                    "counts must match to warm-start"
                )
            params = loaded
            print(f"warm-started params from {cfg.init_checkpoint}", flush=True)
    if state is None:
        state = create_train_state(params, optimizer)
    state = replicate_state(state, plan.replicated)

    ckpt = CheckpointManager(
        os.path.join(cfg.output_dir, "checkpoints"), max_to_keep=cfg.max_checkpoints
    )
    # Resume the LOOP counter from the checkpoint label, not state.step:
    # non-finite skipped iterations advance the loop (and the label) but
    # not state.step, and Orbax refuses to re-save an existing label — a
    # resume at state.step would re-reach and re-save it.
    resume_label = None
    if cfg.resume and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        resume_label = ckpt.latest_step()
        print(
            f"resumed from checkpoint {resume_label} "
            f"(optimizer step {int(state.step)})",
            flush=True,
        )

    weight_schedule = LossWeightSchedule(
        content=cfg.content_weight,
        style=cfg.style_weight,
        tv=cfg.tv_weight,
        decay_every=cfg.weight_decay_every,
    )
    if cfg.spatial > 1:
        from fast_neural_style_transfer_tpu.train.spatial_step import (
            make_spatial_train_step,
        )

        train_step = make_spatial_train_step(
            optimizer,
            plan,
            taps=taps,
            weight_schedule=weight_schedule,
            precision=prec,
            lr=cfg.lr,
            total_steps=cfg.total_steps,
            grad_accum=cfg.grad_accum,
            remat=cfg.remat,
        )
    else:
        train_step = make_train_step(
            optimizer,
            taps=taps,
            weight_schedule=weight_schedule,
            precision=prec,
            lr=cfg.lr,
            total_steps=cfg.total_steps,
            grad_accum=cfg.grad_accum,
            num_styles=num_styles,
            remat=cfg.remat,
            norm_method="onepass" if cfg.in_stats == "onepass" else "auto",
        )
    eval_forward = make_eval_forward(precision=prec)

    dataset = ImageFolderDataset(cfg.dataset_dir, cfg.image_size, seed=cfg.seed)
    pipeline = InputPipeline(
        dataset,
        cfg.batch_size,
        seed=cfg.seed,
        num_workers=cfg.num_workers,
        sharding=plan.batch_sharding,
        pad_to_multiple=8 if pad_batch_active else 0,
        num_data_shards=max(plan.num_data_shards, 1),
    )
    batch_mask = None
    if pipeline.batch_mask_global is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        batch_mask = jax.device_put(
            pipeline.batch_mask_global,
            NamedSharding(plan.mesh, PartitionSpec("data")),
        )

    monitor_img = None
    if cfg.monitor_image:
        if os.path.exists(cfg.monitor_image):
            monitor_img = jnp.asarray(load_image(cfg.monitor_image, cfg.image_size))
        else:
            print(
                f"monitor image {cfg.monitor_image} not found; "
                "skipping monitor sampling",
                flush=True,
            )

    logger = MetricLogger(
        os.path.join(cfg.output_dir, "metrics.jsonl"), print_every=cfg.log_every
    )
    rng = jax.random.PRNGKey(cfg.seed + 1)
    start_step = int(state.step) if resume_label is None else resume_label
    t_start = time.perf_counter()

    # Preemption handling (SURVEY.md §5.3): TPU VMs get SIGTERM before
    # eviction; finish the in-flight step, then the finally-block persists a
    # restorable checkpoint. Installed only on the main thread; restored after.
    stop_requested = threading.Event()
    handler_installed = False
    prev_handler = None
    if threading.current_thread() is threading.main_thread():
        def _on_sigterm(signum, frame):
            print("SIGTERM received: checkpointing and stopping", flush=True)
            stop_requested.set()

        prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)
        handler_installed = True

    profiling = False
    step = start_step
    try:
        for batch in pipeline.device_batches(cfg.num_epochs):
            if step >= cfg.total_steps or stop_requested.is_set():
                break
            if cfg.profile_stop > cfg.profile_start:
                if step == cfg.profile_start and not profiling:
                    jax.profiler.start_trace(os.path.join(cfg.output_dir, "profile"))
                    profiling = True
                elif step == cfg.profile_stop and profiling:
                    jax.profiler.stop_trace()
                    profiling = False
            rng, step_rng = jax.random.split(rng)
            with jax.profiler.StepTraceAnnotation("train_step", step_num=step):
                if batch_mask is not None:
                    state, metrics = train_step(
                        state, vgg_params, batch, style_grams, step_rng,
                        batch_mask
                    )
                else:
                    state, metrics = train_step(
                        state, vgg_params, batch, style_grams, step_rng
                    )
            step += 1
            logger.update(metrics)

            if logger.should_log(step):
                logger.flush(step)
            if monitor_img is not None and step % cfg.monitor_every == 0:
                if num_styles == 1:
                    out = eval_forward(state.params, monitor_img)
                    path = os.path.join(cfg.output_dir, f"sample_step_{step}.jpg")
                    save_image(np.asarray(out), path)
                    print(f"saved monitor sample {path}", flush=True)
                else:
                    # one sample per style; bake_style collapses the (S, C)
                    # IN banks so the single compiled eval forward is reused
                    from fast_neural_style_transfer_tpu.models.transformer import (
                        bake_style,
                    )

                    for s in range(num_styles):
                        out = eval_forward(
                            bake_style(state.params, s), monitor_img
                        )
                        path = os.path.join(
                            cfg.output_dir, f"sample_step_{step}_style{s}.jpg"
                        )
                        save_image(np.asarray(out), path)
                    print(
                        f"saved {num_styles} monitor samples at step {step}",
                        flush=True,
                    )
            if step % cfg.checkpoint_every == 0:
                ckpt.save(step, state)
                print(f"checkpoint saved at step {step}", flush=True)
    finally:
        # preemption/exception safety: always stop tracing, flush metrics,
        # and leave a restorable checkpoint behind. Each cleanup step is
        # isolated: a device-side failure can surface inside flush's D2H
        # fetches, and that must not mask the original exception or abort
        # the checkpoint save / handler restore behind it.
        def _cleanup(what, fn):
            try:
                fn()
            except Exception as e:
                print(f"cleanup: {what} failed: {e!r}", flush=True)

        if profiling:
            _cleanup("profiler stop", jax.profiler.stop_trace)
        if logger.pending:
            _cleanup("metrics flush", lambda: logger.flush(step))
        if step > start_step and ckpt.latest_step() != step:
            _cleanup("final checkpoint", lambda: ckpt.save(step, state))
        _cleanup("checkpoint wait", ckpt.wait)
        _cleanup("logger close", logger.close)
        _cleanup("checkpoint close", ckpt.close)
        if handler_installed:
            # prev_handler may be None (handler installed from C) — restore
            # the default in that case rather than leaking our handler
            signal.signal(signal.SIGTERM, prev_handler or signal.SIG_DFL)

    wall = time.perf_counter() - t_start
    done = step - start_step
    if done:
        print(f"trained {done} steps in {wall:.1f}s ({done / wall:.2f} steps/s)", flush=True)

    final_path = os.path.join(cfg.output_dir, "style_transfer_final.npz")
    save_params_npz(jax.device_get(state.params), final_path)
    print(f"final params saved to {final_path}", flush=True)
    try:  # loss-curve PNGs (the assets the reference committed by hand)
        from fast_neural_style_transfer_tpu.utils.visualization import plot_loss_curves

        plot_loss_curves(os.path.join(cfg.output_dir, "metrics.jsonl"), cfg.output_dir)
    except Exception as e:  # plotting must never fail a training run
        print(f"loss-curve plotting skipped: {e}", flush=True)
    return final_path
