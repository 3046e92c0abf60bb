#!/usr/bin/env python
"""Chip evidence for `fnst-video` (VERDICT r3 #6): natural-motion clip A/B.

Builds a panning clip (sliding 256^2 crop over a real photograph — the
reference's own demo content, /root/reference/dancing.jpg), stylizes it with
a TRAINED checkpoint twice — per-frame IN (the reference's inference.py
semantics applied framewise, the flicker baseline) vs frozen-IN
stabilization — and reports:

  * whole-frame flicker (mean |inter-frame diff|) for input / plain / stab —
    on a pan this is dominated by genuine motion, so also:
  * ALIGNED flicker: the pan shift is known (dx px/frame), so frame t+1 is
    shifted back onto frame t and differenced over the overlap. Genuine
    content cancels exactly up to style-texture resampling; what remains is
    temporal instability. (DESIGN.md §13: whole-frame flicker on
    content-dominated clips measures motion, not normalization.)
  * wall frames/sec through VideoStylizer.stylize_frames on this chip.

Writes evidence/video_r4/: report.json + input/plain/stab sample frames +
both output GIFs.

Usage: python tools/video_evidence.py <checkpoint.npz> [outdir]
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def make_pan_clip(src_path: str, n: int = 48, dx: int = 4, hw: int = 256):
    """(n, hw, hw, 3) uint8: a crop window panning right dx px/frame."""
    from PIL import Image

    im = Image.open(src_path).convert("RGB")
    w_need = hw + dx * (n - 1)
    im = im.resize((w_need, hw), Image.BILINEAR)
    arr = np.asarray(im, np.uint8)
    return np.stack([arr[:, i * dx:i * dx + hw] for i in range(n)]), dx


def aligned_flicker(frames_u8: np.ndarray, dx: int) -> float:
    """Mean |diff| after compensating the known pan: frame t+1 shifted left
    by dx aligns with frame t over columns [dx:]. Static-content changes
    cancel; the residual is temporal instability + texture resampling."""
    f = np.asarray(frames_u8, np.float32)
    d = np.abs(f[1:, :, : -dx or None] - f[:-1, :, dx:])
    return float(d.mean())


def main():
    ckpt = sys.argv[1]
    outdir = sys.argv[2] if len(sys.argv) > 2 else "evidence/video_r4"
    os.makedirs(outdir, exist_ok=True)
    from PIL import Image

    import jax
    from fast_neural_style_transfer_tpu.infer.video import (
        VideoStylizer,
        flicker_score,
        write_frames,
    )

    platform = jax.devices()[0].platform
    prec = "bf16" if platform == "tpu" else "f32"
    clip, dx = make_pan_clip("/root/reference/dancing.jpg")

    outs, fps = {}, {}
    for name, stab in (("plain", False), ("stab", True)):
        vs = VideoStylizer.from_checkpoint(ckpt, precision=prec,
                                           stabilize=stab)
        vs.stylize_frames(clip[:8])  # compile + warm outside the timing
        vs.reset_reference()
        if stab:
            # re-capture the reference stats BEFORE the timed window: without
            # this the stab run pays a one-time device dispatch + H2D inside
            # the timing that the plain run has no analogue of, biasing the
            # A/B wall numbers against stab (ADVICE r4)
            vs.set_reference(clip[0])
        t0 = time.perf_counter()
        out = vs.stylize_frames(clip)
        wall = time.perf_counter() - t0
        outs[name], fps[name] = out, clip.shape[0] / wall

    report = {
        "device": platform,
        "checkpoint": ckpt,
        "clip": {"frames": int(clip.shape[0]), "hw": 256, "pan_px_per_frame": dx,
                 "source": "/root/reference/dancing.jpg"},
        "whole_frame_flicker": {
            "input": flicker_score(clip),
            "plain_per_frame_IN": flicker_score(outs["plain"]),
            "stabilized_frozen_IN": flicker_score(outs["stab"]),
        },
        "aligned_flicker": {
            "input": aligned_flicker(clip, dx),
            "plain_per_frame_IN": aligned_flicker(outs["plain"], dx),
            "stabilized_frozen_IN": aligned_flicker(outs["stab"], dx),
        },
        "wall_fps": {k: round(v, 1) for k, v in fps.items()},
    }
    for name, frames in (("input", clip), ("plain", outs["plain"]),
                         ("stab", outs["stab"])):
        for t in (0, clip.shape[0] // 2, clip.shape[0] - 1):
            Image.fromarray(frames[t]).save(
                os.path.join(outdir, f"{name}_t{t:02d}.jpg"), quality=92)
    write_frames(outs["plain"], os.path.join(outdir, "plain.gif"))
    write_frames(outs["stab"], os.path.join(outdir, "stab.gif"))
    with open(os.path.join(outdir, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
