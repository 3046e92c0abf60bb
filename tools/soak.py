#!/usr/bin/env python
"""Soak drill: long b20 bf16 training run with a mid-run SIGTERM + resume.

Evidence generator for PARITY.md §soak (the reference's recipe is 80k steps
at batch 20, /root/reference/config.py:3-6; this drill runs >=2k steps on
the attached chip with a preemption in the middle).

Usage:
  python tools/soak.py dataset  [dir] [n_images]   # synthesize content set
  python tools/soak.py phase_a  [outdir]           # run; SIGTERM at ~50%
  python tools/soak.py phase_b  [outdir]           # resume to completion
  python tools/soak.py report   [outdir]           # verify + summarize
"""
import json
import os
import signal
import subprocess
import sys
import time

# Defaults reproduce the round-2 b20 drill; override via env for other
# shapes (e.g. FNST_SOAK_BATCH=96 for the throughput-optimal batch —
# DESIGN.md §8). phase_a persists the RESOLVED values to
# <outdir>/soak_config.json and later phases read them back, so a
# phase_b/report run without the env re-exported cannot silently resume
# with different parameters than the run it is resuming.
_DEFAULTS = {
    "total_steps": int(os.environ.get("FNST_SOAK_STEPS", 2200)),
    "batch": int(os.environ.get("FNST_SOAK_BATCH", 20)),
    "ckpt_every": int(os.environ.get("FNST_SOAK_CKPT_EVERY", 250)),
    "dataset_dir": os.environ.get("FNST_SOAK_DATASET", "/tmp/soak_ds"),
}


def _run_config(outdir: str, *, create: bool = False) -> dict:
    """The run's resolved parameters: read from outdir if present, else the
    env-resolved defaults (persisted there when ``create``)."""
    path = os.path.join(outdir, "soak_config.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    if create:
        os.makedirs(outdir, exist_ok=True)
        with open(path, "w") as f:
            json.dump(_DEFAULTS, f)
    return dict(_DEFAULTS)


def make_dataset(root: str, n: int = 400) -> None:
    import numpy as np
    from PIL import Image

    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        h, w = int(rng.integers(280, 512)), int(rng.integers(280, 512))
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack([
            127 + 120 * np.sin(2 * np.pi * (xx / rng.integers(16, 200)
                                            + rng.random())),
            127 + 120 * np.cos(2 * np.pi * (yy / rng.integers(16, 200)
                                            + rng.random())),
            rng.integers(0, 255) * np.ones_like(xx, dtype=np.float64),
        ], axis=-1)
        img += rng.normal(0, 24, img.shape)
        Image.fromarray(np.clip(img, 0, 255).astype("uint8")).save(
            os.path.join(root, f"img{i:04d}.jpg"))
    print(f"wrote {n} images under {root}")


def _cfg(outdir: str):
    from fast_neural_style_transfer_tpu.train.loop import TrainConfig

    rc = _run_config(outdir)
    return TrainConfig(
        style_image="/root/reference/picasso.jpg",
        dataset_dir=rc["dataset_dir"],
        output_dir=outdir,
        monitor_image="/root/reference/dancing.jpg",
        total_steps=rc["total_steps"],
        batch_size=rc["batch"],
        precision="bf16",
        checkpoint_every=rc["ckpt_every"],
        log_every=50,
        monitor_every=500,
        max_checkpoints=100,   # keep the whole chain as evidence
        num_workers=8,
    )


def _last_step(metrics: str) -> int:
    try:
        with open(metrics) as f:
            line = None
            for line in f:
                pass
        return json.loads(line).get("step", -1) if line else -1
    except (OSError, ValueError):
        return -1


# cold-compile grace added on top of stall_s while a child has produced no
# row yet (hostile b20 measured up to ~492 s on a persistent-cache miss)
_COMPILE_GRACE_S = 900.0


def _trainer_argv(outdir: str):
    """argv of one training child (separated so tests can substitute a fake
    trainer and exercise the watchdog without a backend)."""
    code = (
        "import sys; sys.path.insert(0, '/root/repo');"
        "from tools.soak import _cfg;"
        "from fast_neural_style_transfer_tpu.train.loop import "
        "train_style_transfer;"
        f"train_style_transfer(_cfg({outdir!r}))"
    )
    return [sys.executable, "-c", code]


def run_phase(outdir: str, kill_at_step=None, *,
              stall_s: float = None, max_restarts: int = 50,
              poll_s: float = 5.0, backoff_s: float = 30.0) -> None:
    """Run training in a subprocess; optionally SIGTERM it once
    metrics.jsonl passes ``kill_at_step`` (the preemption drill).

    Stall watchdog (round 5): the tunneled backend can hang a D2H fetch
    indefinitely (observed: a b20 run frozen >13 min mid-step with the
    process healthy but asleep in the tunnel read). If metrics.jsonl stops
    advancing for ``stall_s`` (FNST_SOAK_STALL_S, default 480 s; grace of
    +``_COMPILE_GRACE_S`` while this child has no row yet — cold compile),
    the child is SIGKILLed and relaunched
    — the loop auto-resumes from the latest Orbax checkpoint, so at most
    ckpt_every steps re-run (and the report's duplicate-step check still
    applies to the drill resume). The drill SIGTERM is sent exactly once.
    """
    if stall_s is None:
        stall_s = float(os.environ.get("FNST_SOAK_STALL_S", 480))
    metrics = os.path.join(outdir, "metrics.jsonl")
    sent = False
    for attempt in range(max_restarts):
        proc = subprocess.Popen(_trainer_argv(outdir), cwd="/root/repo")
        launched = time.time()
        stalled = False
        while proc.poll() is None:
            time.sleep(poll_s)
            step = _last_step(metrics)
            try:
                st = os.stat(metrics)
                if st.st_size > 0 and st.st_mtime >= launched:
                    # rows from THIS launch: plain row-to-row staleness
                    fresh_for = time.time() - st.st_mtime
                else:
                    # no row from this child yet (the loop creates the file
                    # empty at startup, and a relaunch inherits the previous
                    # child's stale rows): measure from launch with a cold-
                    # compile grace — the hostile b20 shape compiles up to
                    # ~492 s when the persistent cache misses
                    fresh_for = time.time() - launched - _COMPILE_GRACE_S
            except OSError:
                fresh_for = time.time() - launched - _COMPILE_GRACE_S
            if fresh_for > stall_s:
                print(f"[soak] metrics stalled {fresh_for:.0f}s at step "
                      f"{step}: SIGKILL + resume (attempt {attempt + 1})",
                      flush=True)
                proc.kill()
                proc.wait()
                stalled = True
                break
            if not sent and kill_at_step is not None and step >= kill_at_step:
                print(f"metrics at step {step}: sending SIGTERM", flush=True)
                proc.send_signal(signal.SIGTERM)
                sent = True
        if stalled:
            time.sleep(backoff_s)  # let the tunnel drain before the resume
            continue
        # child exited on its own
        if kill_at_step is None or sent:
            break
        print("[soak] child exited before the drill step; relaunching",
              flush=True)
    print("phase exit:", proc.returncode, "(SIGTERM sent:", sent, ")")


def report(outdir: str) -> None:
    metrics = os.path.join(outdir, "metrics.jsonl")
    rows = [json.loads(l) for l in open(metrics)]
    steps = [r["step"] for r in rows if "step" in r]
    losses = [(r["step"], r["loss"]) for r in rows if "loss" in r]
    ckpts = sorted(
        int(d) for d in os.listdir(os.path.join(outdir, "checkpoints"))
        if d.isdigit())
    dup = len(steps) - len(set(steps))
    print(json.dumps({
        "logged_rows": len(steps),
        "max_step": max(steps),
        "duplicate_steps_after_resume": dup,
        "checkpoints": ckpts,
        "first_loss": losses[0],
        "last_loss": losses[-1],
        "nonfinite_skips": sum(r.get("skipped_nonfinite", 0) for r in rows),
    }, indent=2))


if __name__ == "__main__":
    cmd = sys.argv[1]
    if cmd == "dataset":
        # default target = the dir the phases will read (FNST_SOAK_DATASET)
        make_dataset(sys.argv[2] if len(sys.argv) > 2
                     else _DEFAULTS["dataset_dir"],
                     int(sys.argv[3]) if len(sys.argv) > 3 else 400)
    elif cmd == "phase_a":
        outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/soak_out"
        rc = _run_config(outdir, create=True)  # pin params for later phases
        run_phase(outdir, kill_at_step=rc["total_steps"] // 2)
    elif cmd == "phase_b":
        run_phase(sys.argv[2] if len(sys.argv) > 2 else "/tmp/soak_out")
    elif cmd == "report":
        report(sys.argv[2] if len(sys.argv) > 2 else "/tmp/soak_out")
    else:
        raise SystemExit(f"unknown command {cmd}")
