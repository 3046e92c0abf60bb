"""Inference: arbitrary-resolution stylization without recompile storms.

Rebuild of /root/reference/inference.py with its defects fixed: input is
canonically ImageNet-normalized (the reference fed raw [0,1] at inference but
trained on normalized input — defect #7), the checkpoint path given is the one
loaded (defect #8), and output filenames are the caller's choice.

Arbitrary resolutions (the reference's fully-convolutional selling point,
README.md:112-115) meet jit's static-shape rule via *shape bucketing*: inputs
are reflect-padded up to a bucket (multiple of 64 by default), the compiled
program for that bucket is cached, and the output is cropped back. Batches of
equally-sized images go through in one forward.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fast_neural_style_transfer_tpu.core.dtypes import Precision, canonical_compute_dtype
from fast_neural_style_transfer_tpu.core.shapes import pad_to_multiple_reflect
from fast_neural_style_transfer_tpu.models import TransformerNet
from fast_neural_style_transfer_tpu.utils.image_io import (
    denormalize_image,
    load_image,
    save_image,
)


class Stylizer:
    """Holds stylizer params + a per-bucket cache of compiled forwards."""

    def __init__(
        self,
        params: Any,
        *,
        precision: str = "f32",
        bucket_multiple: int = 64,
    ):
        self.params = params
        self.precision: Precision = canonical_compute_dtype(precision)
        self.bucket_multiple = bucket_multiple
        self._fwd = jax.jit(
            lambda p, x: TransformerNet.apply(p, x, train=False, precision=self.precision)
        )

    # -- constructors -------------------------------------------------------

    @classmethod
    def from_checkpoint(cls, path: str, **kw) -> "Stylizer":
        """Load from .npz (native), Orbax checkpoint dir, or reference-style
        torch .pth (via export/torch_convert)."""
        template = TransformerNet.init(jax.random.PRNGKey(0))
        if path.endswith(".npz"):
            from fast_neural_style_transfer_tpu.train.checkpoint import load_params_npz

            params = load_params_npz(template, path)
        elif path.endswith(".pt"):
            raise ValueError(
                "TorchScript .pt archives bake weights into the traced graph "
                "and cannot be imported; load the matching .pth/.npz instead"
            )
        elif path.endswith((".pth", ".bin")):
            from fast_neural_style_transfer_tpu.export.torch_convert import (
                load_torch_checkpoint,
            )

            params = load_torch_checkpoint(path)
        else:
            from fast_neural_style_transfer_tpu.train.checkpoint import CheckpointManager
            from fast_neural_style_transfer_tpu.train.state import (
                create_train_state,
                make_optimizer,
            )

            mgr = CheckpointManager(path)
            state = mgr.restore(create_train_state(template, make_optimizer()))
            params = state.params
        return cls(jax.tree.map(jnp.asarray, params), **kw)

    # -- forward ------------------------------------------------------------

    def __call__(self, batch: np.ndarray) -> np.ndarray:
        """Network-space NHWC in -> network-space NHWC out (same H, W)."""
        x = jnp.asarray(batch, jnp.float32)
        padded, (h, w) = pad_to_multiple_reflect(x, self.bucket_multiple)
        out = self._fwd(self.params, padded)
        return np.asarray(out[:, :h, :w, :])

    def stylize(self, image: np.ndarray) -> np.ndarray:
        """Network-space (ImageNet-normalized) (H,W,3)/(N,H,W,3) float in ->
        [0,1] stylized out. Use ``utils.image_io.normalize_image``/
        ``load_image`` to produce network-space input; feeding raw [0,1] here
        would reproduce the reference's inference preprocessing defect (#7)."""
        if image.ndim == 3:
            out = self.stylize(image[None])
            return out[0]
        return denormalize_image(self(image))


def stylize_image_file(
    model_path: str,
    content_path: str,
    output_path: str,
    *,
    size: Optional[Tuple[int, int]] = None,
    precision: str = "f32",
) -> str:
    """File-in/file-out single-image path (reference test_inference,
    inference.py:27-61 — minus its preprocessing bug)."""
    stylizer = Stylizer.from_checkpoint(model_path, precision=precision)
    x = load_image(content_path, size)  # canonical normalize (defect #7 fix)
    out = stylizer(x)
    save_image(out, output_path)  # denormalize + clamp + save
    return output_path
