"""Multi-style: train ONE net on several styles, then select/blend/export.

Conditional instance norm (models/transformer.py): per-style (S, C) IN
affine banks, shared convs. The train step samples a style per example;
inference bakes a selection or convex blend back into a standard
single-style net (so u8/int8/spatial/export paths are unchanged).
Forces CPU; synthetic data — the real CLIs do this at scale with
``--style_image a.jpg b.jpg`` / ``--style_index`` / ``--style_blend``.

    python examples/multistyle.py [output_dir]
"""

import os
import sys

# run from a source checkout without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from fast_neural_style_transfer_tpu.infer import Stylizer
from fast_neural_style_transfer_tpu.losses import LossTaps, style_targets_from_features
from fast_neural_style_transfer_tpu.models import TransformerNet, VGG19Features, bake_style
from fast_neural_style_transfer_tpu.models.vgg_weights import resolve_params
from fast_neural_style_transfer_tpu.train import (
    LossWeightSchedule,
    create_train_state,
    make_train_step,
)
from fast_neural_style_transfer_tpu.train.checkpoint import save_params_npz
from fast_neural_style_transfer_tpu.train.state import make_optimizer
from fast_neural_style_transfer_tpu.utils import save_image

NUM_STYLES = 2


def main(out_dir: str = "multistyle_out") -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    taps = LossTaps(content_tap="relu4_2")
    vgg = resolve_params(None)

    # 1. one net for S styles: (S, C) conditional-IN banks, shared convs
    params = TransformerNet.init(jax.random.PRNGKey(0), num_styles=NUM_STYLES)

    # 2. per-layer (S, c, c) style-Gram banks, one row per style image
    style_imgs = [
        jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
        for _ in range(NUM_STYLES)
    ]
    per_style = [
        style_targets_from_features(VGG19Features.apply(vgg, s, taps.style_taps))
        for s in style_imgs
    ]
    banks = tuple(jnp.stack(layer) for layer in zip(*per_style))

    # 3. train: the jitted step samples a style per example and conditions
    #    both the stylizer's instance norms and the loss targets with it
    opt = make_optimizer(lr=1e-3, total_steps=100)
    state = create_train_state(params, opt)
    step = make_train_step(opt, taps=taps, weight_schedule=LossWeightSchedule(),
                           lr=1e-3, total_steps=100, donate=False,
                           num_styles=NUM_STYLES)
    batch = jnp.asarray(rng.normal(size=(4, 64, 64, 3)), jnp.float32)
    prng = jax.random.PRNGKey(1)
    for _ in range(3):
        prng, k = jax.random.split(prng)
        state, metrics = step(state, vgg, batch, banks, k)
        print(f"step {int(state.step)}: loss {float(metrics['loss']):.4g}")

    # 4. serve: bake a style (or a blend) into a standard single-style net
    image = rng.normal(size=(1, 96, 96, 3)).astype(np.float32)
    for name, choice in [("style0", 0), ("style1", 1), ("blend", [0.5, 0.5])]:
        out = Stylizer(bake_style(state.params, choice))(image)
        save_image(out, os.path.join(out_dir, f"{name}.jpg"))

    # 5. the saved artifact keeps the banks; loaders require a selection
    final = os.path.join(out_dir, "multistyle_final.npz")
    save_params_npz(jax.device_get(state.params), final)
    styl = Stylizer.from_checkpoint(final, style=1)  # bakes on load
    styl(image)
    print(f"wrote {sorted(os.listdir(out_dir))} to {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "multistyle_out")
