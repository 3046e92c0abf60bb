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
    p.add_argument("--content_dir", type=str, default=None,
                   help="Stylize every image under this directory instead "
                        "(batched on device; outputs <relpath>_stylized.jpg, "
                        "subdirectories mirrored)")
    p.add_argument("--batch_size", type=int, default=16,
                   help="Device batch size for --content_dir jobs")
    p.add_argument("--data_parallel", action="store_true",
                   help="Shard --content_dir batches over all chips "
                        "(params replicated)")
    p.add_argument("--skip_bad_images", action="store_true",
                   help="--content_dir jobs: log and skip undecodable files "
                        "instead of failing the whole job")
    p.add_argument("--model_path", type=str, default="model_weights",
                   help="Model weights: .npz, Orbax checkpoint dir, or reference .pth")
    p.add_argument("--output_name", type=str, default="stylized_output.jpg",
                   help="Output filename (the reference hard-coded a typo'd name)")
    p.add_argument("--size", type=int, nargs=2, default=None, metavar=("H", "W"),
                   help="Optional resize; default keeps the native resolution")
    p.add_argument("--precision", type=str, default="f32",
                   choices=["f32", "bf16", "int8"],
                   help="int8 = quantized inference (4x smaller weights; raw "
                        "convs ~2x bf16 but end-to-end parity on v5e — "
                        "see infer/quantized.py)")
    p.add_argument("--spatial", type=int, default=1,
                   help="Shard image height over N chips (halo-exchange "
                        "forward; for very large images)")
    p.add_argument("--style_index", type=int, default=None,
                   help="Multi-style checkpoints: which trained style to use")
    p.add_argument("--style_blend", type=float, nargs="+", default=None,
                   metavar="W",
                   help="Multi-style checkpoints: length-S weights that "
                        "convexly blend the trained styles (e.g. 0.5 0.5)")
    p.add_argument("--preserve_color", default="off", choices=["off", "luma"],
                   help="'luma' keeps only the stylized luminance and takes "
                        "chrominance from the content (Gatys color control; "
                        "folded into the jitted forward, works in bulk too)")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    from fast_neural_style_transfer_tpu.cli import enable_compilation_cache

    enable_compilation_cache()
    from fast_neural_style_transfer_tpu.infer import stylize_image_file

    from fast_neural_style_transfer_tpu.cli import resolve_style_flags

    try:
        style = resolve_style_flags(args.style_index, args.style_blend)
    except ValueError as e:
        raise SystemExit(str(e))

    os.makedirs(args.output_dir, exist_ok=True)
    out_path = os.path.join(args.output_dir, args.output_name)
    if args.content_dir:
        if args.spatial > 1:
            raise SystemExit(
                "--content_dir and --spatial cannot be combined yet; run "
                "spatial jobs per image, or use --data_parallel to use all "
                "chips on directory batches"
            )
        from fast_neural_style_transfer_tpu.infer import stylize_directory

        written = stylize_directory(
            args.model_path,
            args.content_dir,
            args.output_dir,
            size=tuple(args.size) if args.size else None,
            batch_size=args.batch_size,
            precision=args.precision,
            data_parallel=args.data_parallel,
            style=style,
            skip_bad_images=args.skip_bad_images,
            preserve_color=args.preserve_color,
        )
        done = [w for w in written if w]
        print(f"saved {len(done)} stylized images to {args.output_dir}"
              + (f" ({len(written) - len(done)} skipped)"
                 if len(done) != len(written) else ""))
        return
    if args.spatial > 1:
        if args.precision == "int8":
            raise SystemExit("--precision int8 is not supported with --spatial "
                             "(the halo-exchange forward is float-only)")
        import numpy as np

        from fast_neural_style_transfer_tpu.infer import Stylizer, stylize_spatial
        from fast_neural_style_transfer_tpu.parallel import make_mesh_plan
        from fast_neural_style_transfer_tpu.utils import load_image, save_image

        plan = make_mesh_plan(spatial=args.spatial)
        stylizer = Stylizer.from_checkpoint(args.model_path, precision=args.precision,
                                            style=style)
        x = load_image(args.content_image, tuple(args.size) if args.size else None)
        out = stylize_spatial(stylizer.params, x, plan,
                              precision=stylizer.precision)
        if args.preserve_color == "luma":
            import jax.numpy as jnp

            from fast_neural_style_transfer_tpu.utils.color import (
                luminance_transfer,
            )
            from fast_neural_style_transfer_tpu.utils.image_io import (
                IMAGENET_MEAN,
                IMAGENET_STD,
            )

            mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
            std = jnp.asarray(IMAGENET_STD, jnp.float32)
            out01 = luminance_transfer(jnp.asarray(out) * std + mean,
                                       jnp.asarray(x) * std + mean)
            out = (out01 - mean) / std
        save_image(np.asarray(out), out_path)
    else:
        out_path = stylize_image_file(
            args.model_path,
            args.content_image,
            out_path,
            size=tuple(args.size) if args.size else None,
            precision=args.precision,
            style=style,
            preserve_color=args.preserve_color,
        )
    print(f"saved {out_path}")


if __name__ == "__main__":
    main()
