"""fnst-parity: one-command SSIM parity check against the reference.

Verifies the BASELINE.md north star (SSIM >= 0.98 vs reference outputs) the
moment a reference-trained checkpoint is available: loads the ``.pth`` into
BOTH the reference's own StyleTransferNet (/root/reference/models/model.py,
executed as the oracle) and our TPU stylizer, runs the same content image
through both, and prints one JSON line with the SSIM.

Input modes:
- ``reference-exact`` (default): feed raw [0,1] input, reproducing the
  reference inference pipeline BIT-FOR-BIT including its missing input
  normalization (inference.py:28-31, defect #7) and its ImageNet
  de-normalize + clamp output handling (inference.py:52-57). This is the
  mode that reproduces the reference's committed sample images.
- ``canonical``: ImageNet-normalized input on both sides (the preprocessing
  the model was trained with; our default inference path).

Optionally ``--reference_sample`` also scores our output directly against a
committed reference output file (e.g. sample_image_picasso.jpg).

Usage:
    fnst-parity --reference_pth ckpt.pth --content dancing.jpg \
                [--size 256 256] [--mode reference-exact] \
                [--output_dir out/] [--reference_repo /root/reference]
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
from typing import Optional, Tuple

import numpy as np


def _load_reference_net(reference_repo: str, pth_path: str):
    """Construct the reference's StyleTransferNet with the .pth weights."""
    import torch

    model_py = os.path.join(reference_repo, "models", "model.py")
    if not os.path.exists(model_py):
        raise FileNotFoundError(
            f"reference repo not found at {reference_repo} (need models/model.py)"
        )
    sys.path.insert(0, reference_repo)
    try:
        spec = importlib.util.spec_from_file_location("fnst_ref_model", model_py)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(reference_repo)

    net = mod.StyleTransferNet()
    ckpt = torch.load(pth_path, map_location="cpu", weights_only=False)
    state = ckpt.get("model_state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    net.load_state_dict(state, strict=True)
    net.eval()
    return net


def run_parity(
    reference_pth: str,
    content: str,
    *,
    size: Tuple[int, int] = (256, 256),
    mode: str = "reference-exact",
    reference_repo: str = "/root/reference",
    output_dir: Optional[str] = None,
    reference_sample: Optional[str] = None,
) -> dict:
    import torch

    import jax.numpy as jnp

    from fast_neural_style_transfer_tpu.infer.stylize import Stylizer
    from fast_neural_style_transfer_tpu.utils.image_io import (
        denormalize_image,
        load_image,
        save_image,
    )
    from fast_neural_style_transfer_tpu.utils.ssim import ssim

    if mode not in ("reference-exact", "canonical"):
        raise ValueError(f"unknown mode {mode!r}")

    # one input tensor feeds both nets (NHWC float32, batch 1)
    x = load_image(content, size, normalize=(mode == "canonical"))

    # reference side: their module, their output handling (denorm + clamp)
    ref_net = _load_reference_net(reference_repo, reference_pth)
    with torch.no_grad():
        ref_out = ref_net(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy()))
    ref_img = denormalize_image(np.transpose(ref_out.numpy(), (0, 2, 3, 1))[0])

    # our side: the same .pth through the TPU stylizer
    stylizer = Stylizer.from_checkpoint(reference_pth)
    our_img = denormalize_image(np.asarray(stylizer(x))[0])

    result = {
        "metric": "ssim_vs_reference_net",
        "value": round(ssim(our_img, ref_img), 6),
        "threshold": 0.98,
        "mode": mode,
        "size": list(size),
        "pass": None,  # filled below
    }
    result["pass"] = bool(result["value"] >= result["threshold"])

    if reference_sample:
        # score in memory — writing files is --output_dir's job only (no
        # surprise images dropped into cwd)
        from fast_neural_style_transfer_tpu.utils.image_io import (
            decode_image,
            resize_image,
        )

        samp = decode_image(reference_sample)
        if samp.shape[:2] != our_img.shape[:2]:
            samp = resize_image(samp, our_img.shape[:2])
        result["ssim_vs_sample_file"] = round(
            ssim(our_img, samp / 255.0), 6
        )
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        save_image(our_img, os.path.join(output_dir, "parity_ours.jpg"),
                   denormalize=False)
        save_image(ref_img, os.path.join(output_dir, "parity_reference.jpg"),
                   denormalize=False)
    return result


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="SSIM parity: our stylizer vs the reference's own net "
                    "running the same .pth"
    )
    p.add_argument("--reference_pth", type=str, required=True,
                   help="Reference checkpoint (.pth: state_dict or training "
                        "checkpoint dict)")
    p.add_argument("--content", type=str, required=True,
                   help="Content image both pipelines stylize")
    p.add_argument("--size", type=int, nargs=2, default=[256, 256],
                   metavar=("H", "W"))
    p.add_argument("--mode", type=str, default="reference-exact",
                   choices=["reference-exact", "canonical"],
                   help="Input preprocessing (see module docstring)")
    p.add_argument("--reference_repo", type=str, default="/root/reference",
                   help="Path to the reference repository checkout")
    p.add_argument("--output_dir", type=str, default=None,
                   help="Also save both stylized outputs here")
    p.add_argument("--reference_sample", type=str, default=None,
                   help="Optional committed reference output file to score "
                        "our output against directly")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    result = run_parity(
        args.reference_pth,
        args.content,
        size=tuple(args.size),
        mode=args.mode,
        reference_repo=args.reference_repo,
        output_dir=args.output_dir,
        reference_sample=args.reference_sample,
    )
    print(json.dumps(result))
    return 0 if result["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
