"""AdaIN serving: cached-style arbitrary stylization + bulk directory jobs.

``models.adain.stylize_arbitrary`` re-encodes the style image(s) on every
call — right for one-offs, wasteful for serving where one style processes
many content images. ``ArbitraryStylizer`` encodes the style(s) ONCE into
the interpolation-folded (mu, sigma) pair and then runs a jitted
uint8-roundtrip forward per content batch: u8 in -> on-device normalize ->
VGG encode -> re-normalize to the cached style moments -> decode ->
de-normalize -> u8 out. Both transfer directions carry 1/4 the f32 bytes
(the same transport win as ``Stylizer.stylize_u8``), and alpha is a traced
operand — changing style strength never recompiles.

Bulk jobs reuse the shared decode/run/encode software pipeline
(``infer.stylize.pipeline_directory``).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fast_neural_style_transfer_tpu.core.dtypes import Precision, canonical_compute_dtype
from fast_neural_style_transfer_tpu.core.shapes import pad_to_multiple_reflect
from fast_neural_style_transfer_tpu.models.adain import (
    ENCODE_TAP,
    AdaINDecoder,
    blended_style_stats,
    channel_stats,
)
from fast_neural_style_transfer_tpu.models.vgg import VGG19Features


class ArbitraryStylizer:
    """Decoder + frozen VGG with a cached style; serves uint8 batches.

    ``sharding``: optional batch sharding (``make_mesh_plan().batch_sharding``)
    — batches whose leading dim divides the mesh's data axis run
    data-parallel with params replicated, like ``Stylizer``.
    """

    def __init__(
        self,
        decoder_params: Any,
        vgg_params: Any,
        *,
        precision: str = "f32",
        sharding: Optional[Any] = None,
        bucket_multiple: int = 64,
        preserve_color: str = "off",
    ):
        # preserve_color='luma' folds Gatys color control INTO the jitted
        # u8 roundtrip (the content is already in-graph): stylized
        # luminance + content chrominance, zero extra transfers. 'match'
        # cannot be cached-style served — it re-colors the style PIXELS per
        # content, so the folded (mu, sigma) pair would change per image;
        # use the single-image CLI path for it.
        if preserve_color not in ("off", "luma"):
            raise ValueError(
                f"preserve_color must be 'off' or 'luma' for serving "
                f"(got {preserve_color!r}); 'match' is per-content and "
                "defeats the cached style")
        self.preserve_color = preserve_color
        # bucket_multiple trades pad distortion against recompiles: content
        # is reflect-padded up to the (H, W) bucket before the forward, and
        # the padded rows DO enter the global AdaIN moments (cropped away
        # afterwards) — 8 is the geometric minimum (VGG pools + decoder
        # ups) and distorts least, but a bulk job over a real photo folder
        # then compiles one program per distinct source shape. 64 matches
        # Stylizer (whose instance-norm stats are equally global) and keeps
        # heterogeneous directories to a handful of programs.
        self.bucket_multiple = bucket_multiple
        self.precision: Precision = canonical_compute_dtype(precision)
        self.decoder_params = decoder_params
        self.vgg_params = vgg_params
        self.sharding = sharding
        if sharding is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            rep = NamedSharding(sharding.mesh, PartitionSpec())
            self.decoder_params = jax.device_put(self.decoder_params, rep)
            self.vgg_params = jax.device_put(self.vgg_params, rep)
        self._style: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None
        self._fwd_u8 = jax.jit(self._u8_roundtrip)

    def set_style(self, style, style_weights=None) -> "ArbitraryStylizer":
        """Encode style image(s) (network-space NHWC float) once; a list
        interpolates with convex ``style_weights``. Returns self."""
        self._style = blended_style_stats(
            self.vgg_params, style, style_weights, precision=self.precision)
        return self

    def set_style_u8(self, style_u8, style_weights=None) -> "ArbitraryStylizer":
        """Like ``set_style`` but from raw uint8 HWC/NHWC image(s)."""
        from fast_neural_style_transfer_tpu.utils.image_io import normalize_image

        styles = (list(style_u8) if isinstance(style_u8, (list, tuple))
                  else [style_u8])
        net = []
        for s in styles:
            a = np.asarray(s)
            if a.dtype != np.uint8:
                raise TypeError(f"set_style_u8 wants uint8, got {a.dtype}")
            if a.ndim == 3:
                a = a[None]
            # VGG's three pools need dims divisible by 8; only the channel
            # statistics matter, so reflect-pad (never crop content away).
            # normalize_image takes uint8-scale input (it divides by 255).
            net.append(pad_to_multiple_reflect(
                jnp.asarray(normalize_image(a)), 8)[0])
        return self.set_style(net, style_weights)

    def _u8_roundtrip(self, dec, vgg, x_u8, mu_s, sigma_s, alpha):
        from fast_neural_style_transfer_tpu.utils.image_io import (
            network_to_u8_jnp,
            u8_to_network_jnp,
        )

        x = u8_to_network_jnp(x_u8)
        (c_feat,) = VGG19Features.apply(vgg, x, (ENCODE_TAP,),
                                        precision=self.precision)
        mu_c, sigma_c = channel_stats(c_feat)
        cf = c_feat.astype(jnp.float32)
        t = sigma_s * (cf - mu_c) / sigma_c + mu_s
        t = alpha * t + (1.0 - alpha) * cf
        y = AdaINDecoder.apply(dec, t.astype(c_feat.dtype),
                               precision=self.precision)
        if self.preserve_color == "luma":
            from fast_neural_style_transfer_tpu.utils.color import (
                luminance_transfer,
            )
            from fast_neural_style_transfer_tpu.utils.image_io import (
                IMAGENET_MEAN,
                IMAGENET_STD,
            )

            mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
            std = jnp.asarray(IMAGENET_STD, jnp.float32)
            y01 = luminance_transfer(y * std + mean, x * std + mean)
            y = (y01 - mean) / std
        return network_to_u8_jnp(y)

    def _place(self, padded: jnp.ndarray) -> jnp.ndarray:
        from fast_neural_style_transfer_tpu.parallel.mesh import place_on_data_axis

        return place_on_data_axis(self.sharding, padded)

    def stylize_u8(self, image_u8: np.ndarray, *, alpha: float = 1.0) -> np.ndarray:
        """Raw uint8 (H,W,3)/(N,H,W,3) content in -> stylized uint8 out,
        using the cached style. Pads H, W up to the ``bucket_multiple``
        shape bucket (reflect) and crops back; padded rows enter the global
        AdaIN moments — see the constructor note on the tradeoff."""
        if self._style is None:
            raise ValueError("no style set: call set_style(_u8) first")
        squeeze = image_u8.ndim == 3
        x = jnp.asarray(image_u8[None] if squeeze else image_u8)
        if x.dtype != jnp.uint8:
            raise TypeError(f"stylize_u8 wants uint8, got {x.dtype}")
        padded, (h, w) = pad_to_multiple_reflect(x, self.bucket_multiple)
        mu_s, sigma_s = self._style
        out = np.asarray(self._fwd_u8(
            self.decoder_params, self.vgg_params, self._place(padded),
            mu_s, sigma_s, jnp.asarray(alpha, jnp.float32)))[:, :h, :w, :]
        return out[0] if squeeze else out


def stylize_directory_arbitrary(
    decoder_path: str,
    content_dir: str,
    output_dir: str,
    style_paths,
    *,
    style_weights=None,
    alpha: float = 1.0,
    vgg_weights: Optional[str] = None,
    size: Optional[Tuple[int, int]] = None,
    batch_size: int = 16,
    precision: str = "f32",
    num_workers: int = 8,
    data_parallel: bool = False,
    skip_bad_images: bool = False,
    preserve_color: str = "off",
) -> list:
    """Stylize every image under ``content_dir`` with one arbitrary style
    (or an interpolated set): the AdaIN counterpart of
    ``infer.stylize.stylize_directory``, sharing its software-pipelined
    bulk engine. The style is encoded once for the whole job."""
    from fast_neural_style_transfer_tpu.cli.adain import load_decoder
    from fast_neural_style_transfer_tpu.data.dataset import scan_image_files
    from fast_neural_style_transfer_tpu.infer.stylize import pipeline_directory
    from fast_neural_style_transfer_tpu.models.vgg_weights import resolve_params
    from fast_neural_style_transfer_tpu.utils.image_io import decode_image

    sharding = None
    if data_parallel:
        from fast_neural_style_transfer_tpu.parallel import make_mesh_plan

        plan = make_mesh_plan()
        plan.check_batch(batch_size)
        sharding = plan.batch_sharding

    styler = ArbitraryStylizer(
        load_decoder(decoder_path), resolve_params(vgg_weights),
        precision=precision, sharding=sharding,
        preserve_color=preserve_color,
    )
    paths = (list(style_paths) if isinstance(style_paths, (list, tuple))
             else [style_paths])
    styler.set_style_u8([decode_image(p) for p in paths], style_weights)

    files = scan_image_files(content_dir)
    return pipeline_directory(
        lambda b: styler.stylize_u8(b, alpha=alpha),
        files, content_dir, output_dir,
        size=size, batch_size=batch_size, num_workers=num_workers,
        skip_bad_images=skip_bad_images,
    )
