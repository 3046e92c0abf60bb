"""End-to-end: a tiny training run through the full orchestration layer
(mesh, pipeline, jitted SPMD step, monitor sampling, checkpointing, final
artifact), then inference from the produced artifact. The SURVEY.md §4 tier-(d)
integration test."""

import glob
import json
import os

import numpy as np
import pytest
from PIL import Image

from fast_neural_style_transfer_tpu.infer import stylize_image_file
from fast_neural_style_transfer_tpu.train import TrainConfig, train_style_transfer


@pytest.fixture
def workspace(tmp_path):
    rng = np.random.default_rng(0)
    data = tmp_path / "data"
    data.mkdir()
    for i in range(10):
        Image.fromarray(rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)).save(
            data / f"img_{i}.jpg"
        )
    style = tmp_path / "style.jpg"
    Image.fromarray(rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)).save(style)
    monitor = tmp_path / "monitor.jpg"
    Image.fromarray(rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)).save(monitor)
    return tmp_path


@pytest.mark.slow
def test_tiny_training_run_end_to_end(workspace):
    out_dir = str(workspace / "out")
    cfg = TrainConfig(
        style_image=str(workspace / "style.jpg"),
        dataset_dir=str(workspace / "data"),
        output_dir=out_dir,
        monitor_image=str(workspace / "monitor.jpg"),
        total_steps=4,
        batch_size=8,
        image_size=(32, 32),
        log_every=2,
        monitor_every=2,
        checkpoint_every=2,
        num_workers=2,
        resume=False,
        profile_start=1,
        profile_stop=2,
    )
    with pytest.warns(UserWarning, match="VGG19"):  # random-VGG fallback warning
        final = train_style_transfer(cfg)

    assert os.path.exists(final)
    assert glob.glob(os.path.join(out_dir, "sample_step_*.jpg"))
    # profiler trace was started/stopped around steps [1, 2)
    assert glob.glob(os.path.join(out_dir, "profile", "**", "*.pb"), recursive=True) or \
        glob.glob(os.path.join(out_dir, "profile", "**", "*.json*"), recursive=True)
    metrics_path = os.path.join(out_dir, "metrics.jsonl")
    records = [json.loads(l) for l in open(metrics_path)]
    assert records and all(np.isfinite(r["loss"]) for r in records)
    assert records[-1]["step"] == 4

    # inference from the final artifact
    out_img = stylize_image_file(
        final, str(workspace / "monitor.jpg"), str(workspace / "styled.jpg")
    )
    with Image.open(out_img) as im:
        assert im.size == (40, 40)

    # resume continues from the saved checkpoint
    cfg.resume = True
    cfg.total_steps = 6
    with pytest.warns(UserWarning, match="VGG19"):
        train_style_transfer(cfg)
    records = [json.loads(l) for l in open(metrics_path)]
    assert records[-1]["step"] == 6


@pytest.mark.slow
def test_resume_uses_checkpoint_label_not_state_step(workspace):
    """Non-finite skipped iterations advance the loop counter (and hence the
    checkpoint label) but not state.step. A resume that restarted the loop at
    state.step would re-reach an already-saved label and crash in Orbax
    (StepAlreadyExistsError). Simulate the divergence directly: save a
    checkpoint whose label exceeds its state.step, then resume past it."""
    import jax.numpy as jnp

    from fast_neural_style_transfer_tpu.train.checkpoint import CheckpointManager
    from fast_neural_style_transfer_tpu.train.state import (
        create_train_state,
        make_optimizer,
    )
    from fast_neural_style_transfer_tpu.models.transformer import TransformerNet
    import jax

    out_dir = str(workspace / "skip_out")
    cfg = TrainConfig(
        style_image=str(workspace / "style.jpg"),
        dataset_dir=str(workspace / "data"),
        output_dir=out_dir,
        total_steps=2,
        batch_size=8,
        image_size=(32, 32),
        log_every=1,
        monitor_every=1000,
        checkpoint_every=2,
        num_workers=2,
        resume=False,
    )
    with pytest.warns(UserWarning, match="VGG19"):
        train_style_transfer(cfg)

    # Forge the divergence: label 4, but state.step = 3 (one skipped step).
    ckpt_dir = os.path.join(out_dir, "checkpoints")
    mgr = CheckpointManager(ckpt_dir, max_to_keep=3)
    template = create_train_state(
        TransformerNet.init(jax.random.PRNGKey(0)),
        make_optimizer(total_steps=6),
    )
    state = mgr.restore(template)
    assert mgr.latest_step() == 2
    mgr.save(4, state._replace(step=jnp.asarray(3, state.step.dtype)))
    mgr.wait()
    mgr.close()

    # Resume to 6: the loop must restart at label 4 (not state.step 3) and
    # save label 6 — restarting at 3 would re-save label 4 and crash.
    cfg.resume = True
    cfg.total_steps = 6
    with pytest.warns(UserWarning, match="VGG19"):
        train_style_transfer(cfg)
    mgr = CheckpointManager(ckpt_dir, max_to_keep=3)
    assert mgr.latest_step() == 6
    mgr.close()
    records = [json.loads(l) for l in open(os.path.join(out_dir, "metrics.jsonl"))]
    assert records[-1]["step"] == 6


@pytest.mark.slow
def test_num_epochs_bounds_training(workspace):
    """--num_epochs is wired (VERDICT r1 #10): an epochs-bounded run stops at
    epochs * steps_per_epoch even when total_steps is larger."""
    out_dir = str(workspace / "epochs_out")
    cfg = TrainConfig(
        style_image=str(workspace / "style.jpg"),
        dataset_dir=str(workspace / "data"),  # 10 images
        output_dir=out_dir,
        total_steps=100,
        num_epochs=2,
        batch_size=8,  # drop_last -> 1 batch/epoch -> 2 steps total
        image_size=(32, 32),
        log_every=1,
        monitor_every=1000,
        checkpoint_every=1000,
        num_workers=2,
        resume=False,
    )
    with pytest.warns(UserWarning, match="VGG19"):
        train_style_transfer(cfg)
    records = [json.loads(l) for l in open(os.path.join(out_dir, "metrics.jsonl"))]
    assert records[-1]["step"] == 2


@pytest.mark.slow
def test_hostile_batch_shape_warns(workspace, capsys):
    """Per-chip batches that are not a multiple of 8 pad up in XLA's
    (batch, channel)-tiled conv layouts (the reference's own b20 default,
    /root/reference/config.py:4, pads to 24 on v5e — DESIGN.md §8); the loop
    must say so up front. On the 8-device test mesh batch 8 -> per-chip 1."""
    out_dir = str(workspace / "hostile_out")
    cfg = TrainConfig(
        style_image=str(workspace / "style.jpg"),
        dataset_dir=str(workspace / "data"),
        output_dir=out_dir,
        total_steps=1,
        batch_size=8,
        image_size=(32, 32),
        log_every=1,
        monitor_every=1000,
        checkpoint_every=1000,
        num_workers=1,
        resume=False,
    )
    with pytest.warns(UserWarning, match="VGG19"):
        train_style_transfer(cfg)
    captured = capsys.readouterr().out
    assert "not a multiple of 8" in captured
    assert "DESIGN.md" in captured


def test_training_rejects_non_multiple_of_4_image_size(tmp_path):
    """Non-multiple-of-4 training sizes either crash opaquely inside jit
    (odd) or silently train on misregistered content features (e.g. 250 ->
    252); the loop must refuse them up front with the reason."""
    cfg = TrainConfig(
        style_image="unused.jpg", dataset_dir="unused",
        output_dir=str(tmp_path), image_size=(255, 255),
    )
    with pytest.raises(ValueError, match="multiple of 4"):
        train_style_transfer(cfg)


def test_cli_parsers_flag_parity():
    from fast_neural_style_transfer_tpu.cli.begin_inference import (
        build_parser as infer_parser,
    )
    from fast_neural_style_transfer_tpu.cli.begin_training import (
        build_parser as train_parser,
    )

    # every reference begin_training.py flag must parse (begin_training.py:12-26)
    args = train_parser().parse_args(
        [
            "--style_image", "s.jpg", "--training_monitor_content_image", "m.jpg",
            "--dataset_dir", "d", "--output_dir", "o",
            "--content_weight", "5", "--style_weight", "2", "--tv_weight", "1",
            "--num_epochs", "1", "--batch_size", "4", "--total_steps", "10",
            "--lr", "1e-4", "--checkpoint_path", "c",
        ]
    )
    assert args.content_weight == 5.0 and args.batch_size == 4
    assert args.num_epochs == 1  # wired as an epochs bound (None = unbounded)
    assert args.content_tap is None and not args.reference_taps

    # tap-parity flags (ADVICE r1: reference-exact taps selectable from CLI)
    args = train_parser().parse_args(["--reference_taps"])
    assert args.reference_taps and args.num_epochs is None
    args = train_parser().parse_args(["--content_tap", "relu3_3"])
    assert args.content_tap == "relu3_3"

    # reference begin_inference.py flags (begin_inference.py:11-14)
    args = infer_parser().parse_args(
        ["--output_dir", "o", "--content_image", "c.jpg", "--model_path", "m.npz"]
    )
    assert args.model_path == "m.npz"


@pytest.mark.slow
def test_sigterm_checkpoints_and_exits_cleanly(workspace):
    """Preemption drill: SIGTERM mid-training must stop the loop, persist a
    checkpoint, and exit 0 (SURVEY.md §5.3 preemption safety)."""
    import signal
    import subprocess
    import sys
    import time as _time

    out_dir = workspace / "sig_out"
    code = f"""
import jax
jax.config.update("jax_platforms", "cpu")
from fast_neural_style_transfer_tpu.train import TrainConfig, train_style_transfer
cfg = TrainConfig(
    style_image=r"{workspace / 'style.jpg'}",
    dataset_dir=r"{workspace / 'data'}",
    output_dir=r"{out_dir}",
    total_steps=10_000, batch_size=8, image_size=(32, 32),
    log_every=1, monitor_every=10_000, checkpoint_every=10_000,
    num_workers=2, resume=False,
)
train_style_transfer(cfg)
"""
    proc = subprocess.Popen(
        [sys.executable, "-c", code],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        env={**os.environ, "XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
    )
    metrics = out_dir / "metrics.jsonl"
    deadline = _time.time() + 240
    try:
        while _time.time() < deadline:  # wait until at least one step logged
            if metrics.exists() and metrics.read_text().strip():
                break
            if proc.poll() is not None:
                raise AssertionError(
                    f"training exited early: {proc.stdout.read().decode()[-2000:]}"
                )
            _time.sleep(1)
        else:
            raise AssertionError("no training step within 240s")
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=180)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 0, out.decode()[-2000:]
    assert b"SIGTERM received" in out
    assert (out_dir / "checkpoints").exists()
    assert os.path.exists(out_dir / "style_transfer_final.npz")
