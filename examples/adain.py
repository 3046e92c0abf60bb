"""AdaIN arbitrary-style transfer through the library API.

One decoder (models/adain.py), ANY style image at inference — no per-style
training runs at all (vs the reference's one-net-per-style regime,
/root/reference/train.py). Trains a few steps on synthetic data, then
stylizes with a style never seen in training, sweeps the alpha strength
knob, and interpolates two styles. Forces CPU; the real CLI
(``fnst-adain``) does this at scale.

    python examples/adain.py [output_dir]
"""

import os
import sys

# run from a source checkout without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax

from fast_neural_style_transfer_tpu.models import AdaINDecoder, stylize_arbitrary
from fast_neural_style_transfer_tpu.models.vgg_weights import resolve_params
from fast_neural_style_transfer_tpu.train.adain import make_adain_train_step
from fast_neural_style_transfer_tpu.train.checkpoint import save_params_npz
from fast_neural_style_transfer_tpu.train.state import create_train_state
from fast_neural_style_transfer_tpu.utils import save_image
from fast_neural_style_transfer_tpu.utils.image_io import normalize_image


def main(out_dir: str = "adain_out") -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    vgg = resolve_params(None)

    # 1. train the decoder: content and style batches stream independently;
    #    the step takes uint8 batches (the pipeline's transport dtype)
    opt = optax.adam(1e-4)
    state = create_train_state(AdaINDecoder.init(jax.random.PRNGKey(0)), opt)
    step = make_adain_train_step(opt, donate=False)
    content = jnp.asarray(rng.integers(0, 256, (2, 64, 64, 3)), jnp.uint8)
    style = jnp.asarray(rng.integers(0, 256, (2, 64, 64, 3)), jnp.uint8)
    for _ in range(3):
        state, metrics = step(state, vgg, content, style)
        print(f"step {int(state.step)}: loss {float(metrics['loss']):.4g}")

    # 2. stylize with a NEVER-SEEN style image (that is the whole point);
    #    normalize_image takes uint8-scale pixels and returns network-space
    #    (ImageNet-normalized) NHWC
    c_img = normalize_image(rng.integers(0, 256, (1, 96, 96, 3)).astype(np.uint8))
    s_new = normalize_image(rng.integers(0, 256, (1, 80, 80, 3)).astype(np.uint8))
    out = stylize_arbitrary(state.params, vgg, c_img, s_new)
    save_image(np.asarray(out), os.path.join(out_dir, "arbitrary.jpg"))

    # 3. alpha sweeps style strength at inference (0 = content reconstruction)
    for alpha in (0.0, 0.5, 1.0):
        out = stylize_arbitrary(state.params, vgg, c_img, s_new, alpha=alpha)
        save_image(np.asarray(out), os.path.join(out_dir, f"alpha{alpha:.1f}.jpg"))

    # 4. interpolate two styles with convex weights (paper eq. 15)
    s_other = normalize_image(rng.integers(0, 256, (1, 64, 64, 3)).astype(np.uint8))
    out = stylize_arbitrary(state.params, vgg, c_img, [s_new, s_other],
                            style_weights=[0.7, 0.3])
    save_image(np.asarray(out), os.path.join(out_dir, "interpolated.jpg"))

    # 5. serving: cache the style once (ArbitraryStylizer), then stream
    #    uint8 batches through one compiled program — alpha is a traced
    #    operand, so sweeping strength reuses the same executable
    from fast_neural_style_transfer_tpu.infer import ArbitraryStylizer

    styler = ArbitraryStylizer(state.params, vgg, bucket_multiple=8)
    styler.set_style_u8(rng.integers(0, 256, (64, 64, 3), dtype=np.uint8))
    frames = rng.integers(0, 256, (4, 96, 96, 3), dtype=np.uint8)
    for a in (0.4, 1.0):
        out_u8 = styler.stylize_u8(frames, alpha=a)
        save_image(out_u8[0].astype(np.float32) / 255.0,
                   os.path.join(out_dir, f"served_a{a:.1f}.jpg"),
                   denormalize=False)  # stylize_u8 already returns pixels

    # 6. color control (paper §7.2): keep the content's palette — 'match'
    #    re-colors the style before encoding, luminance transfer swaps the
    #    chrominance after; both pure jnp (utils/color.py)
    from fast_neural_style_transfer_tpu.utils.color import (
        luminance_transfer,
        match_color,
    )

    out = stylize_arbitrary(state.params, vgg, c_img, match_color(s_new, c_img))
    save_image(np.asarray(out), os.path.join(out_dir, "color_matched.jpg"))
    out = stylize_arbitrary(state.params, vgg, c_img, s_new)
    save_image(np.asarray(luminance_transfer(out, c_img)),
               os.path.join(out_dir, "color_luma.jpg"))

    # 7. spatial style control (paper §7.3): per-pixel masks paint each
    #    content region with its own style
    masks = np.zeros((2, 96, 96), np.float32)
    masks[0, :, :48] = 1.0  # left half: s_new
    masks[1, :, 48:] = 1.0  # right half: s_other
    out = stylize_arbitrary(state.params, vgg, c_img, [s_new, s_other],
                            style_masks=masks)
    save_image(np.asarray(out), os.path.join(out_dir, "masked_styles.jpg"))

    final = os.path.join(out_dir, "adain_decoder.npz")
    save_params_npz(jax.device_get(state.params), final)
    print(f"wrote {sorted(os.listdir(out_dir))} to {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "adain_out")
