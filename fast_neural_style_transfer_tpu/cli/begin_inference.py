"""Inference CLI — flag parity with /root/reference/begin_inference.py:11-14."""

from __future__ import annotations

import argparse
import os

from fast_neural_style_transfer_tpu.cli.config import (
    inference_content_image,
    output_dir,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="fast neural style transfer inference (TPU)")
    p.add_argument("--output_dir", type=str, default=output_dir,
                   help="Directory to save results")
    p.add_argument("--content_image", type=str, default=inference_content_image,
                   help="Content image for inference")
    p.add_argument("--model_path", type=str, default="model_weights",
                   help="Model weights: .npz, Orbax checkpoint dir, or reference .pth")
    p.add_argument("--output_name", type=str, default="stylized_output.jpg",
                   help="Output filename (the reference hard-coded a typo'd name)")
    p.add_argument("--size", type=int, nargs=2, default=None, metavar=("H", "W"),
                   help="Optional resize; default keeps the native resolution")
    p.add_argument("--precision", type=str, default="f32", choices=["f32", "bf16"])
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    from fast_neural_style_transfer_tpu.infer import stylize_image_file

    os.makedirs(args.output_dir, exist_ok=True)
    out = stylize_image_file(
        args.model_path,
        args.content_image,
        os.path.join(args.output_dir, args.output_name),
        size=tuple(args.size) if args.size else None,
        precision=args.precision,
    )
    print(f"saved {out}")


if __name__ == "__main__":
    main()
