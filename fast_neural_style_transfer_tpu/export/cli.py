"""Export CLI — the runnable analogue of the reference's export scripts
(onnx_version/onnx_model.py, model_scripting/torchscript_model.py,
hf_uploading.py), unified:

    python -m fast_neural_style_transfer_tpu.export.cli \
        --model out/style_transfer_final.npz \
        --onnx model.onnx --torchscript model_traced.pt --pth model.pth \
        --hub-dir hub/
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    # Export is host-side tensor shuffling; never drag a (possibly remote)
    # TPU backend into it. Must run before any jax backend initializes.
    import jax

    jax.config.update("jax_platforms", "cpu")

    p = argparse.ArgumentParser(description="export a trained stylizer")
    p.add_argument("--model", required=True,
                   help="params: .npz, Orbax checkpoint dir, or reference .pth")
    p.add_argument("--onnx", help="write ONNX graph (opset 11) here")
    p.add_argument("--onnx-dynamic", action="store_true",
                   help="export with symbolic batch/height/width dims instead "
                        "of the reference's static 1x3x256x256")
    p.add_argument("--torchscript", help="write traced TorchScript .pt here")
    p.add_argument("--pth", help="write reference-layout torch checkpoint here")
    p.add_argument("--hub-dir", help="package a Hugging Face repo dir here")
    p.add_argument("--style-index", type=int, default=None,
                   help="Multi-style checkpoints: export this trained style "
                        "(baked into a standard single-style net)")
    p.add_argument("--style-blend", type=float, nargs="+", default=None,
                   metavar="W",
                   help="Multi-style checkpoints: export a convex blend of "
                        "the trained styles (length-S weights)")
    args = p.parse_args(argv)
    if args.onnx_dynamic and not args.onnx:
        p.error("--onnx-dynamic requires --onnx")
    from fast_neural_style_transfer_tpu.cli import resolve_style_flags

    try:
        style = resolve_style_flags(args.style_index, args.style_blend)
    except ValueError as e:
        p.error(str(e).replace("_", "-"))  # this CLI spells the flags with dashes

    from fast_neural_style_transfer_tpu.infer import Stylizer

    params = Stylizer.from_checkpoint(args.model, style=style).params
    wrote = []
    if args.onnx:
        from fast_neural_style_transfer_tpu.export.onnx_export import export_onnx

        shape = ("batch", 3, "height", "width") if args.onnx_dynamic \
            else (1, 3, 256, 256)
        wrote.append(export_onnx(params, args.onnx, input_shape=shape))
    if args.torchscript:
        from fast_neural_style_transfer_tpu.export.torchscript import export_torchscript

        wrote.append(export_torchscript(params, args.torchscript))
    if args.pth:
        from fast_neural_style_transfer_tpu.export.torch_convert import (
            save_torch_checkpoint,
        )

        save_torch_checkpoint(params, args.pth)
        wrote.append(args.pth)
    if args.hub_dir:
        from fast_neural_style_transfer_tpu.export.hf import package_for_hub

        wrote.append(package_for_hub(params, args.hub_dir))
    if not wrote:
        p.error("nothing to do: pass at least one of --onnx/--torchscript/--pth/--hub-dir")
    for w in wrote:
        print(f"wrote {w}")


if __name__ == "__main__":
    main()
