"""Quickstart: the library API end-to-end on synthetic data.

Runs everywhere (forces CPU unless FNST_QUICKSTART_DEVICE=tpu): builds a
stylizer, precomputes style Gram targets, takes a few jitted train steps,
stylizes an image at a non-square resolution, and exports ONNX + a
reference-compatible .pth.

    python examples/quickstart.py [output_dir]
"""

import os
import sys

# run from a source checkout without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("FNST_QUICKSTART_DEVICE", "cpu") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import jax.numpy as jnp
import numpy as np

from fast_neural_style_transfer_tpu.core.dtypes import Precision
from fast_neural_style_transfer_tpu.infer import Stylizer
from fast_neural_style_transfer_tpu.losses import LossTaps, style_targets_from_features
from fast_neural_style_transfer_tpu.models import TransformerNet, VGG19Features
from fast_neural_style_transfer_tpu.models.vgg_weights import resolve_params
from fast_neural_style_transfer_tpu.train import (
    LossWeightSchedule,
    create_train_state,
    make_train_step,
)
from fast_neural_style_transfer_tpu.train.state import make_optimizer
from fast_neural_style_transfer_tpu.utils import save_image


def main(out_dir: str = "quickstart_out") -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    prec = Precision.f32()
    taps = LossTaps(content_tap="relu4_2")

    # 1. networks: stylizer params + frozen VGG features (pretrained weights
    #    via FNST_VGG19_WEIGHTS / resolve_params(path); random fallback here)
    key = jax.random.PRNGKey(0)
    params = TransformerNet.init(key)
    vgg = resolve_params(None)

    # 2. one-time style targets from a style image (synthetic stand-in)
    style = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
    grams = tuple(
        style_targets_from_features(
            VGG19Features.apply(vgg, style, taps.style_taps, precision=prec)
        )
    )

    # 3. a few jitted train steps (whole iteration = one XLA program)
    opt = make_optimizer(lr=1e-3, total_steps=100)
    state = create_train_state(params, opt)
    step = make_train_step(opt, taps=taps, weight_schedule=LossWeightSchedule(),
                           precision=prec, lr=1e-3, total_steps=100, donate=False)
    batch = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    prng = jax.random.PRNGKey(1)
    for i in range(3):
        prng, k = jax.random.split(prng)
        state, metrics = step(state, vgg, batch, grams, k)
        print(f"step {int(state.step)}: loss {float(metrics['loss']):.4g}")

    # 4. arbitrary-resolution inference (bucketing handles the odd size)
    stylizer = Stylizer(state.params)
    image = rng.normal(size=(1, 100, 156, 3)).astype(np.float32)
    out = stylizer(image)
    save_image(out, os.path.join(out_dir, "stylized.jpg"))

    # 5. export: ONNX (dependency-free writer) + reference-format .pth
    from fast_neural_style_transfer_tpu.export import export_onnx, save_torch_checkpoint

    export_onnx(state.params, os.path.join(out_dir, "model.onnx"))
    save_torch_checkpoint(state.params, os.path.join(out_dir, "model.pth"))
    print(f"wrote {sorted(os.listdir(out_dir))} to {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "quickstart_out")
