#!/usr/bin/env python
"""AdaIN decoder soak drill: chip-scale training run with SIGTERM + resume.

Evidence generator for the second model family (train/adain.py), mirroring
tools/soak.py for the flagship trainer: phase_a trains to ~50% and is
SIGTERM'd (the TPU-VM preemption signal), phase_b resumes from the Orbax
chain to completion, report verifies the metrics/checkpoint evidence.

Usage:
  python tools/adain_soak.py dataset                 # content + style sets
  python tools/adain_soak.py phase_a  [outdir]       # run; SIGTERM at ~50%
  python tools/adain_soak.py phase_b  [outdir]       # resume to completion
  python tools/adain_soak.py report   [outdir]       # verify + summarize

Env overrides (pinned to <outdir>/soak_config.json by phase_a):
  FNST_ADAIN_STEPS (default 1500), FNST_ADAIN_BATCH (8, the paper's),
  FNST_ADAIN_CKPT_EVERY (200), FNST_ADAIN_CONTENT, FNST_ADAIN_STYLE.
"""
import json
import os
import signal
import subprocess
import sys
import time

_DEFAULTS = {
    "total_steps": int(os.environ.get("FNST_ADAIN_STEPS", 1500)),
    "batch": int(os.environ.get("FNST_ADAIN_BATCH", 8)),
    "ckpt_every": int(os.environ.get("FNST_ADAIN_CKPT_EVERY", 200)),
    "content_dir": os.environ.get("FNST_ADAIN_CONTENT", "/tmp/adain_content"),
    "style_dir": os.environ.get("FNST_ADAIN_STYLE", "/tmp/adain_style"),
    "image_size": int(os.environ.get("FNST_ADAIN_SIZE", 256)),
}


def _run_config(outdir: str, *, create: bool = False) -> dict:
    path = os.path.join(outdir, "soak_config.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    if create:
        os.makedirs(outdir, exist_ok=True)
        with open(path, "w") as f:
            json.dump(_DEFAULTS, f)
    return dict(_DEFAULTS)


def make_datasets() -> None:
    sys.path.insert(0, "/root/repo")
    import numpy as np
    from PIL import Image

    from tools.soak import make_dataset

    make_dataset(_DEFAULTS["content_dir"], 400)
    # style corpus: a different texture family (radial ripples + checkers)
    root = _DEFAULTS["style_dir"]
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(42)
    for i in range(200):
        h, w = int(rng.integers(280, 512)), int(rng.integers(280, 512))
        yy, xx = np.mgrid[0:h, 0:w]
        cy, cx = rng.integers(0, h), rng.integers(0, w)
        r = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
        img = np.stack([
            127 + 120 * np.sin(2 * np.pi * r / rng.integers(8, 64)),
            127 + 110 * (((xx // rng.integers(8, 48))
                          + (yy // rng.integers(8, 48))) % 2),
            127 + 120 * np.cos(2 * np.pi * r / rng.integers(8, 64)),
        ], axis=-1)
        img += rng.normal(0, 16, img.shape)
        Image.fromarray(np.clip(img, 0, 255).astype("uint8")).save(
            os.path.join(root, f"style{i:04d}.jpg"))
    print(f"wrote 200 style images under {root}")


def run_phase(outdir: str, kill_at_step=None) -> None:
    rc = _run_config(outdir)
    code = (
        "import os, sys; sys.path.insert(0, '/root/repo');"
        # axon's sitecustomize force-overrides the JAX_PLATFORMS env var;
        # honor an explicit cpu request via the config, which does stick
        "import jax;"
        "os.environ.get('JAX_PLATFORMS', '').startswith('cpu') and "
        "jax.config.update('jax_platforms', 'cpu');"
        "from fast_neural_style_transfer_tpu.train.adain import "
        "AdaINTrainConfig, train_adain;"
        f"train_adain(AdaINTrainConfig("
        f"content_dir={rc['content_dir']!r}, style_dir={rc['style_dir']!r},"
        f"output_dir={outdir!r}, total_steps={rc['total_steps']},"
        f"batch_size={rc['batch']}, precision='bf16',"
        f"image_size=({rc['image_size']}, {rc['image_size']}),"
        f"checkpoint_every={rc['ckpt_every']}, log_every=50, num_workers=8,"
        f"max_checkpoints=100))"
    )
    proc = subprocess.Popen([sys.executable, "-c", code], cwd="/root/repo")
    metrics = os.path.join(outdir, "metrics.jsonl")
    if kill_at_step is None:
        proc.wait()
        print("phase exit:", proc.returncode)
        return
    sent = False
    while proc.poll() is None:
        time.sleep(5)
        step = -1
        try:
            with open(metrics) as f:
                for line in f:
                    pass
                step = json.loads(line).get("step", -1)
        except (OSError, ValueError, NameError):
            continue
        if not sent and step >= kill_at_step:
            print(f"metrics at step {step}: sending SIGTERM", flush=True)
            proc.send_signal(signal.SIGTERM)
            sent = True
    print("phase exit:", proc.returncode, "(SIGTERM sent:", sent, ")")


def report(outdir: str) -> None:
    metrics = os.path.join(outdir, "metrics.jsonl")
    rows = [json.loads(l) for l in open(metrics)]
    steps = [r["step"] for r in rows if "step" in r]
    losses = [(r["step"], r["loss"]) for r in rows if "loss" in r]
    ckpts = sorted(
        int(d) for d in os.listdir(os.path.join(outdir, "checkpoints"))
        if d.isdigit())
    rep = json.dumps({
        "logged_rows": len(steps),
        "max_step": max(steps),
        "duplicate_steps_after_resume": len(steps) - len(set(steps)),
        "checkpoints": ckpts,
        "first_loss": losses[0],
        "last_loss": losses[-1],
        "nonfinite_skips": sum(r.get("skipped_nonfinite", 0) for r in rows),
        "final_npz": os.path.exists(
            os.path.join(outdir, "adain_decoder_final.npz")),
    }, indent=2)
    # the evidence artifact tools/chip_program_r3.sh gates stage 2 on
    with open(os.path.join(outdir, "report.json"), "w") as f:
        f.write(rep + "\n")
    print(rep)


if __name__ == "__main__":
    cmd = sys.argv[1]
    if cmd == "dataset":
        make_datasets()
    elif cmd == "phase_a":
        outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/adain_soak"
        rc = _run_config(outdir, create=True)
        run_phase(outdir, kill_at_step=rc["total_steps"] // 2)
    elif cmd == "phase_b":
        run_phase(sys.argv[2] if len(sys.argv) > 2 else "/tmp/adain_soak")
    elif cmd == "report":
        report(sys.argv[2] if len(sys.argv) > 2 else "/tmp/adain_soak")
    else:
        raise SystemExit(f"unknown command {cmd}")
