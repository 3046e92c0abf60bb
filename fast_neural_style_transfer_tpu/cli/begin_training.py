"""Training CLI — flag parity with /root/reference/begin_training.py:12-26,
plus TPU-specific flags (precision, workers, vgg weights path)."""

from __future__ import annotations

import argparse

from fast_neural_style_transfer_tpu.cli.config import (
    dataset_dir,
    loss_weights_config,
    output_dir,
    style_image,
    training_config,
    training_monitor_content_image,
    vgg19_weights,
    vgg_loss_layers,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="train fast neural style transfer (TPU)")
    p.add_argument("--style_image", type=str, nargs="+", default=style_image,
                   help="Path to style image. Multiple paths train ONE net "
                        "on all of them via conditional instance norm "
                        "(per-style IN banks, shared convs); select or blend "
                        "styles at inference with --style_index/--style_blend")
    p.add_argument("--training_monitor_content_image", type=str,
                   default=training_monitor_content_image,
                   help="Path to content image to monitor training")
    p.add_argument("--dataset_dir", type=str, default=dataset_dir,
                   help="Path to content dataset directory")
    p.add_argument("--output_dir", type=str, default=output_dir,
                   help="Directory for checkpoints, samples, final model")
    p.add_argument("--content_weight", type=float,
                   default=loss_weights_config["CONTENT_WEIGHT"],
                   help="Weight for content loss (honored, unlike the reference)")
    p.add_argument("--style_weight", type=float,
                   default=loss_weights_config["STYLE_WEIGHT"],
                   help="Weight for style loss")
    p.add_argument("--tv_weight", type=float,
                   default=loss_weights_config["TV_WEIGHT"],
                   help="Weight for total variation loss")
    p.add_argument("--num_epochs", type=int, default=None,
                   help="Additional bound: stop after N dataset epochs "
                        "(default: step-bounded only, the reference's actual "
                        f"behavior — it accepted {training_config['NUM_EPOCHS']} "
                        "but ignored it)")
    p.add_argument("--batch_size", type=int, default=training_config["BATCH_SIZE"],
                   help="GLOBAL batch size (split across the device mesh)")
    p.add_argument("--total_steps", type=int, default=training_config["TOTAL_STEPS"],
                   help="Total training steps")
    p.add_argument("--lr", type=float, default=training_config["LEARNING_RATE"],
                   help="Learning rate (cosine-annealed to 1e-7)")
    p.add_argument("--checkpoint_path", type=str, default=None,
                   help="Resume: path to a checkpoint dir, .npz, or reference .pth")
    # TPU-native extensions
    p.add_argument("--vgg_weights", type=str, default=vgg19_weights,
                   help="VGG19 ImageNet weights (.npz or torchvision .pth)")
    p.add_argument("--precision", type=str, default="f32", choices=["f32", "bf16"],
                   help="Compute precision (bf16 uses the MXU natively)")
    p.add_argument("--num_workers", type=int, default=8,
                   help="Host image-decode threads")
    p.add_argument("--weight_decay_every", type=int, default=10_000,
                   help="Halve content / double style weight every N steps (0=off)")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="Average gradients over N micro-batches per optimizer "
                        "update (large effective batch without the memory)")
    p.add_argument("--spatial", type=int, default=1,
                   help="Shard image HEIGHT over N chips for high-resolution "
                        "training (uses all devices on the 'space' axis)")
    p.add_argument("--remat", action="store_true",
                   help="Rematerialize the forward in the backward pass "
                        "(jax.checkpoint): ~+1 forward of step time buys "
                        "back the activation memory that bounds max batch "
                        "or image size per chip")
    p.add_argument("--in_stats", choices=("stable", "onepass"),
                   default="stable",
                   help="Instance-norm statistic lowering: 'stable' "
                        "(two-pass, torch-exact — the lockstep-parity "
                        "contract) or 'onepass' (var = E[x²]-mean², one HBM "
                        "pass: -2.1%% b20 / -3.3%% b96 step time on v5e; "
                        "slight precision loss on channels with "
                        "var << mean²)")
    p.add_argument("--pad_batch", action="store_true",
                   help="Pad TPU-hostile per-chip batches (e.g. the "
                        "reference default 20) up to the next multiple of 8 "
                        "with loss-masked dummy images. Gradients stay "
                        "exactly the real batch's; the win is COMPILE time "
                        "(hostile b20 measured 223-492 s vs ~7 s padded), "
                        "not throughput (-3.5%% img/s vs unpadded b20 \u2014 "
                        "prefer real multiples of 8; DESIGN.md \u00a78 "
                        "addendum)")
    p.add_argument("--image_size", type=int, nargs=2, default=None,
                   metavar=("H", "W"),
                   help="Training crop size (default: config TRAIN_IMAGE_SHAPE)")
    p.add_argument("--content_tap", type=str, default=None,
                   help="VGG19 content tap name (default: config CONTENT_LAYER "
                        "= relu4_2, the reference's *intended* tap)")
    p.add_argument("--reference_taps", action="store_true",
                   help="Use the reference's *actual* effective taps (content "
                        "= relu4_3 via its positional index 4) instead of its "
                        "intended relu4_2 — exact loss-dynamics parity")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--profile_start", type=int, default=0,
                   help="Start a jax.profiler trace at this step")
    p.add_argument("--profile_stop", type=int, default=0,
                   help="Stop the trace at this step (writes <output_dir>/profile)")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    from fast_neural_style_transfer_tpu.cli import enable_compilation_cache

    enable_compilation_cache()
    from fast_neural_style_transfer_tpu.train import TrainConfig, train_style_transfer

    # nargs="+" yields a list; a single path keeps the reference's scalar form
    style = args.style_image
    if isinstance(style, list):
        style = style[0] if len(style) == 1 else tuple(style)
    cfg = TrainConfig(
        style_image=style,
        dataset_dir=args.dataset_dir,
        output_dir=args.output_dir,
        vgg_weights=args.vgg_weights,
        monitor_image=args.training_monitor_content_image,
        total_steps=args.total_steps,
        num_epochs=args.num_epochs,
        batch_size=args.batch_size,
        lr=args.lr,
        image_size=tuple(args.image_size) if args.image_size
        else tuple(training_config["TRAIN_IMAGE_SHAPE"]),
        content_weight=args.content_weight,
        style_weight=args.style_weight,
        tv_weight=args.tv_weight,
        weight_decay_every=args.weight_decay_every,
        grad_accum=args.grad_accum,
        content_tap=args.content_tap
        or ("relu4_3" if args.reference_taps else vgg_loss_layers["CONTENT_LAYER"]),
        style_taps=tuple(vgg_loss_layers["STYLE_LAYERS"]),
        style_tap_weights=tuple(vgg_loss_layers["STYLE_LAYER_WEIGHTS"]),
        precision=args.precision,
        seed=args.seed,
        num_workers=args.num_workers,
        spatial=args.spatial,
        remat=args.remat,
        in_stats=args.in_stats,
        pad_batch=args.pad_batch,
        init_checkpoint=args.checkpoint_path,
        profile_start=args.profile_start,
        profile_stop=args.profile_stop,
    )
    train_style_transfer(cfg)


if __name__ == "__main__":
    main()
