"""AdaIN CLI: train the arbitrary-style decoder / stylize with ANY style.

Beyond the reference's one-net-per-style regime: after one decoder
training run, stylization takes a content image AND a style image at
inference time (models/adain.py).

    fnst-adain train --content_dir coco/ --style_dir wikiart/ --output_dir out
    fnst-adain stylize --decoder out/adain_decoder_final.npz \
        --content_image photo.jpg --style_image any_painting.jpg \
        --output stylized.jpg --alpha 0.8
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="AdaIN arbitrary-style transfer (train / stylize)"
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train", help="train the decoder")
    t.add_argument("--content_dir", required=True)
    t.add_argument("--style_dir", required=True,
                   help="Directory of style images (e.g. a painting corpus)")
    t.add_argument("--output_dir", default="adain_output")
    t.add_argument("--vgg_weights", default=None)
    t.add_argument("--total_steps", type=int, default=20_000)
    t.add_argument("--batch_size", type=int, default=8)
    t.add_argument("--lr", type=float, default=1e-4)
    t.add_argument("--remat", action="store_true",
                   help="Rematerialize the decoder + output-VGG forwards in "
                        "the backward (jax.checkpoint): ~+1 forward of step "
                        "time frees the activation memory bounding batch "
                        "per chip")
    t.add_argument("--lr_decay", type=float, default=5e-5,
                   help="Inverse-time lr decay lr/(1+decay*step), the "
                        "paper's recipe; 0 = constant lr")
    t.add_argument("--style_weight", type=float, default=10.0)
    t.add_argument("--image_size", type=int, nargs=2, default=(256, 256),
                   metavar=("H", "W"))
    t.add_argument("--precision", default="f32", choices=["f32", "bf16"])
    t.add_argument("--num_workers", type=int, default=8)
    t.add_argument("--checkpoint_every", type=int, default=2000)
    t.add_argument("--seed", type=int, default=0)

    s = sub.add_parser("stylize", help="stylize with an arbitrary style image")
    s.add_argument("--decoder", required=True,
                   help="trained decoder: .npz or Orbax checkpoint dir")
    s.add_argument("--content_image", default=None)
    s.add_argument("--content_dir", default=None,
                   help="Bulk mode: stylize every image under this directory "
                        "with the given style (software-pipelined batches)")
    s.add_argument("--batch_size", type=int, default=16,
                   help="Bulk mode device batch size")
    s.add_argument("--data_parallel", action="store_true",
                   help="Bulk mode: shard batches over all chips' data axis")
    s.add_argument("--skip_bad_images", action="store_true",
                   help="Bulk mode: log and skip undecodable files instead "
                        "of failing the whole job")
    s.add_argument("--style_image", required=True, nargs="+",
                   help="style image(s); several interpolate styles "
                        "(weights via --style_blend, default equal)")
    s.add_argument("--style_blend", type=float, nargs="+", default=None,
                   metavar="W",
                   help="convex interpolation weights, one per style image")
    s.add_argument("--style_masks", nargs="+", default=None, metavar="MASK",
                   help="per-style grayscale mask images, one per "
                        "--style_image: paint each content region with its "
                        "own style (paper \u00a77.3 spatial control); resized "
                        "to the content, normalized per pixel. Mutually "
                        "exclusive with --style_blend; single-image mode, "
                        "incl. --spatial")
    s.add_argument("--output", default=None,
                   help="Output image path (single; default "
                        "adain_stylized.jpg) or directory (bulk; default "
                        "<content_dir>_stylized)")
    s.add_argument("--alpha", type=float, default=1.0,
                   help="style strength in [0, 1] (0 = content reconstruction)")
    s.add_argument("--preserve_color", default="off",
                   choices=["off", "match", "luma"],
                   help="keep the content's palette (paper §7.2): 'match' "
                        "re-colors the style image(s) to the content's RGB "
                        "mean/covariance before encoding; 'luma' keeps only "
                        "the stylized luminance and takes chrominance from "
                        "the content ('luma' also works in bulk mode, "
                        "folded into the jitted serving program)")
    s.add_argument("--size", type=int, nargs=2, default=None, metavar=("H", "W"))
    s.add_argument("--vgg_weights", default=None)
    s.add_argument("--precision", default="f32", choices=["f32", "bf16"])
    s.add_argument("--spatial", type=int, default=1,
                   help="Shard content height over N chips (halo-exchange "
                        "encode/decode, psum'd AdaIN stats; for very large "
                        "images)")

    e = sub.add_parser("export",
                       help="export the full pipeline (ONNX / TorchScript)")
    e.add_argument("--decoder", required=True)
    e.add_argument("--onnx", default=None, help="output .onnx path")
    e.add_argument("--torchscript", default=None,
                   help="output traced two-input .pt path")
    e.add_argument("--vgg_weights", default=None)
    e.add_argument("--alpha", default=1.0,
                   type=lambda s: s if s == "input" else float(s),
                   help="style strength baked into the graph, or the "
                        "literal 'input' to expose a scalar alpha graph "
                        "input (ONNX only)")
    e.add_argument("--content_shape", type=int, nargs=2, default=(256, 256),
                   metavar=("H", "W"))
    e.add_argument("--style_shape", type=int, nargs=2, default=(256, 256),
                   metavar=("H", "W"))
    e.add_argument("--style_image", nargs="+", default=None,
                   help="Bake these style image(s)' moments into the graph: "
                        "single-input artifact, no style branch (blend "
                        "weights via --style_blend)")
    e.add_argument("--style_blend", type=float, nargs="+", default=None,
                   metavar="W")
    e.add_argument("--preserve_color", default="off", choices=["off", "luma"],
                   help="'luma' bakes Gatys color control into the ONNX "
                        "graph: the artifact's output keeps the content's "
                        "chrominance (ONNX-only)")
    return p


def load_decoder(path: str):
    """Decoder params from .npz, a torch .pth/.pt state_dict (the public
    AdaIN implementations' decoder format, export/torch_adain.py), or an
    Orbax checkpoint directory."""
    import jax

    from fast_neural_style_transfer_tpu.models.adain import AdaINDecoder

    template = AdaINDecoder.init(jax.random.PRNGKey(0))
    if path.endswith(".npz"):
        from fast_neural_style_transfer_tpu.train.checkpoint import load_params_npz

        return load_params_npz(template, path)
    if path.endswith((".pth", ".pt", ".bin")):
        from fast_neural_style_transfer_tpu.export.torch_adain import (
            load_torch_adain_decoder,
        )

        return load_torch_adain_decoder(path)
    import os

    if not os.path.isdir(path):
        raise FileNotFoundError(f"no such decoder checkpoint: {path}")
    from fast_neural_style_transfer_tpu.train.checkpoint import CheckpointManager

    return CheckpointManager(path).restore_params(template)


def _maybe_luma(out, content, mode: str):
    """preserve_color='luma': stylized luminance + content chrominance.
    Both arrays are ImageNet-normalized network space; the YIQ split only
    makes sense on real RGB, so round-trip through [0, 1]."""
    if mode != "luma":
        return out
    import jax.numpy as jnp

    from fast_neural_style_transfer_tpu.utils.color import luminance_transfer
    from fast_neural_style_transfer_tpu.utils.image_io import (
        IMAGENET_MEAN,
        IMAGENET_STD,
    )

    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    out01 = luminance_transfer(out * std + mean, content * std + mean)
    return (out01 - mean) / std


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    from fast_neural_style_transfer_tpu.cli import enable_compilation_cache

    enable_compilation_cache()

    if args.cmd == "train":
        from fast_neural_style_transfer_tpu.train.adain import (
            AdaINTrainConfig,
            train_adain,
        )

        train_adain(AdaINTrainConfig(
            content_dir=args.content_dir,
            style_dir=args.style_dir,
            output_dir=args.output_dir,
            vgg_weights=args.vgg_weights,
            total_steps=args.total_steps,
            batch_size=args.batch_size,
            lr=args.lr,
            lr_decay=args.lr_decay,
            remat=args.remat,
            style_weight=args.style_weight,
            image_size=tuple(args.image_size),
            precision=args.precision,
            num_workers=args.num_workers,
            checkpoint_every=args.checkpoint_every,
            seed=args.seed,
        ))
        return

    if args.cmd == "export":
        import jax

        jax.config.update("jax_platforms", "cpu")  # host-side tensor shuffling
        from fast_neural_style_transfer_tpu.export.onnx_adain import export_adain_onnx
        from fast_neural_style_transfer_tpu.models.vgg_weights import resolve_params

        # validate the full flag combination BEFORE any expensive work or
        # artifact write (a combined export must not exit 1 half-done)
        if not args.onnx and not args.torchscript:
            raise SystemExit("pass --onnx and/or --torchscript")
        if args.style_blend and not args.style_image:
            raise SystemExit(
                "--style_blend without --style_image does nothing: blend "
                "weights only apply when baking style image(s) into the "
                "graph")
        if args.torchscript:
            if args.style_image:
                raise SystemExit(
                    "--style_image baking is ONNX-only; the TorchScript "
                    "artifact keeps the style as a runtime input")
            if args.preserve_color != "off":
                raise SystemExit("--preserve_color is ONNX-only")
            if args.alpha == "input":
                raise SystemExit(
                    "--alpha input is ONNX-only; TorchScript traces bake "
                    "the strength")

        vgg_params = resolve_params(args.vgg_weights)
        baked = None
        if args.style_image:
            import jax.numpy as jnp

            from fast_neural_style_transfer_tpu.core.shapes import (
                pad_to_multiple_reflect,
            )
            from fast_neural_style_transfer_tpu.models.adain import (
                blended_style_stats,
            )
            from fast_neural_style_transfer_tpu.utils import load_image

            styles = [
                pad_to_multiple_reflect(jnp.asarray(load_image(p, None)), 8)[0]
                for p in args.style_image
            ]
            baked = blended_style_stats(vgg_params, styles, args.style_blend)

        decoder = load_decoder(args.decoder)
        if args.onnx:
            export_adain_onnx(
                decoder,
                vgg_params,
                args.onnx,
                alpha=args.alpha,
                content_shape=(1, 3, *args.content_shape),
                style_shape=(1, 3, *args.style_shape),
                baked_style=baked,
                preserve_color=args.preserve_color,
            )
            print(f"wrote {args.onnx}"
                  + (" (baked style, single input)" if baked is not None
                     else ""))
        if args.torchscript:
            from fast_neural_style_transfer_tpu.export.torch_adain import (
                export_adain_torchscript,
            )

            export_adain_torchscript(decoder, vgg_params, args.torchscript,
                                     alpha=args.alpha)
            print(f"wrote {args.torchscript}")
        return

    # stylize
    if (args.content_image is None) == (args.content_dir is None):
        raise SystemExit(
            "pass exactly one of --content_image (single) or "
            "--content_dir (bulk)")
    if args.content_dir is not None:
        if getattr(args, "preserve_color", "off") == "match":
            raise SystemExit(
                "--preserve_color match is per-content (it re-colors the "
                "style pixels) and cannot use the bulk cached-style engine; "
                "'luma' works in bulk, or run 'match' per image")
        if getattr(args, "style_masks", None):
            raise SystemExit(
                "--style_masks applies to single-image mode")
        if args.spatial > 1:
            raise SystemExit(
                "--content_dir and --spatial cannot be combined yet; run "
                "spatial jobs per image, or use --data_parallel to use all "
                "chips on directory batches")
        from fast_neural_style_transfer_tpu.infer.adain import (
            stylize_directory_arbitrary,
        )

        written = stylize_directory_arbitrary(
            args.decoder,
            args.content_dir,
            args.output or args.content_dir.rstrip("/") + "_stylized",
            args.style_image,
            style_weights=args.style_blend,
            alpha=args.alpha,
            vgg_weights=args.vgg_weights,
            size=tuple(args.size) if args.size else None,
            batch_size=args.batch_size,
            precision=args.precision,
            data_parallel=args.data_parallel,
            skip_bad_images=args.skip_bad_images,
            preserve_color=args.preserve_color,
        )
        done = [w for w in written if w]
        print(f"stylized {len(done)} images"
              + (f" ({len(written) - len(done)} skipped)"
                 if len(done) != len(written) else ""))
        return

    out_path = args.output or "adain_stylized.jpg"

    import jax.numpy as jnp
    import numpy as np

    from fast_neural_style_transfer_tpu.core.dtypes import canonical_compute_dtype
    from fast_neural_style_transfer_tpu.core.shapes import pad_to_multiple_reflect
    from fast_neural_style_transfer_tpu.models.adain import stylize_arbitrary
    from fast_neural_style_transfer_tpu.models.vgg_weights import resolve_params
    from fast_neural_style_transfer_tpu.utils import load_image, save_image

    prec = canonical_compute_dtype(args.precision)
    vgg_params = resolve_params(args.vgg_weights)
    decoder = load_decoder(args.decoder)
    size = tuple(args.size) if args.size else None
    content = jnp.asarray(load_image(args.content_image, size))
    styles = [
        pad_to_multiple_reflect(jnp.asarray(load_image(p, None)), 8)[0]
        for p in args.style_image
    ]
    if args.preserve_color == "match":
        # paper §7.2: re-color the style to the content's RGB statistics so
        # the stylization paints with the content's palette. Matching in
        # ImageNet-normalized space matches raw-space statistics too — the
        # normalization is per-channel affine both ways.
        from fast_neural_style_transfer_tpu.utils.color import match_color

        styles = [match_color(s, content) for s in styles]
    if args.spatial > 1:
        from fast_neural_style_transfer_tpu.infer.spatial_adain import (
            stylize_arbitrary_spatial,
        )
        from fast_neural_style_transfer_tpu.parallel import make_mesh_plan

        masks = None
        if args.style_masks:
            from PIL import Image

            if len(args.style_masks) != len(styles):
                raise SystemExit(
                    f"{len(args.style_masks)} --style_masks for "
                    f"{len(styles)} --style_image")
            hh, ww = content.shape[1:3]
            masks = np.stack([
                np.asarray(
                    Image.open(mp).convert("L").resize((ww, hh),
                                                       Image.BILINEAR),
                    np.float32) / 255.0
                for mp in args.style_masks
            ])
        plan = make_mesh_plan(spatial=args.spatial)
        out = stylize_arbitrary_spatial(
            decoder, vgg_params, content, styles, plan, alpha=args.alpha,
            style_weights=args.style_blend, style_masks=masks,
            precision=prec)
        out = _maybe_luma(out, content, args.preserve_color)
        save_image(np.asarray(out), out_path)
        print(f"saved {out_path}")
        return
    # content H, W must divide 8 (VGG pools + decoder ups); reflect-pad up
    # and crop back. Style images only contribute channel statistics, but
    # VGG's pools still need their dims to divide 8.
    content_orig = content
    content, (h, w) = pad_to_multiple_reflect(content, 8)
    masks = None
    if args.style_masks:
        from PIL import Image

        if len(args.style_masks) != len(styles):
            raise SystemExit(
                f"{len(args.style_masks)} --style_masks for "
                f"{len(styles)} --style_image")
        loaded = [
            np.asarray(
                Image.open(m).convert("L").resize((w, h), Image.BILINEAR),
                np.float32) / 255.0
            for m in args.style_masks
        ]
        masks = np.stack(loaded)
        ph, pw = content.shape[1] - h, content.shape[2] - w
        if ph or pw:  # mirror the content's pad so mask pixels track it
            masks = np.pad(masks, ((0, 0), (0, ph), (0, pw)), mode="edge")
    out = stylize_arbitrary(decoder, vgg_params, content, styles,
                            alpha=args.alpha, style_weights=args.style_blend,
                            style_masks=masks, precision=prec)
    out = _maybe_luma(jnp.asarray(out)[:, :h, :w, :], content_orig,
                      args.preserve_color)
    save_image(np.asarray(out), out_path)
    print(f"saved {out_path}")


if __name__ == "__main__":
    main()
