"""Video stylization with frozen-statistics temporal stabilization.

The reference stylizes single images (/root/reference/inference.py) and its
README sells "real-time" use (README.md:5,108-109); applied frame-by-frame to
video, per-frame instance normalization makes the output flicker: every IN
site re-normalizes each frame with its own spatial moments, so small content
motion shifts the global tone of the whole stylized frame (the instability
analyzed by Gupta et al. 2017, "Characterizing and Improving Stability in
Neural Style Transfer"). This module removes that source of flicker without
retraining: capture every IN site's (mean, var) from ONE reference frame
(models/transformer.py ``return_stats=True``) and normalize all frames with
those frozen — or blended, ``stats_blend < 1`` — moments instead
(``in_stats=...``). Stylization is otherwise the production u8 path: one
jitted uint8->uint8 roundtrip per shape bucket, frames batched.

TPU notes: frames of one video share a shape, so the whole clip runs through
one compiled program at a caller-chosen batch; stats ride along as a small
f32 pytree ((1,1,1,C) per site — broadcast over the frame batch on device);
host<->device transport stays uint8 both directions.

IO is dependency-light by design (no ffmpeg/codecs in this image): frame
directories (sorted) and animated GIFs (PIL) in; frame directory or GIF out.
"""

from __future__ import annotations

import os
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fast_neural_style_transfer_tpu.core.dtypes import canonical_compute_dtype
from fast_neural_style_transfer_tpu.core.shapes import pad_to_multiple_reflect
from fast_neural_style_transfer_tpu.models import TransformerNet
from fast_neural_style_transfer_tpu.utils.image_io import (
    network_to_u8_jnp,
    u8_to_network_jnp,
)

_FRAME_EXTS = (".png", ".jpg", ".jpeg")


def _natural_key(name: str):
    """Sort key splitting digit runs so frame_2 < frame_10."""
    import re

    return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", name)]


class VideoStylizer:
    """Stylize frame sequences with IN statistics frozen to a reference frame.

    ``stats_blend``: 1.0 freezes every IN site's moments to the reference
    frame's (maximum temporal stability); 0.0 is the plain per-frame
    stylizer; intermediate values blend, trading stability against
    adaptation to scene changes. ``stabilize=False`` skips capture entirely
    (baseline / A-B comparisons).

    One instance is per-clip: the reference statistics are captured once
    (from frame 0 on first use, or via ``set_reference``) and cached. To
    reuse an instance on a second, unrelated clip call ``reset_reference()``
    first — otherwise the new clip is silently stabilized to the old clip's
    reference frame (``stylize_video_file`` constructs a fresh instance per
    clip).
    """

    def __init__(
        self,
        params: Any,
        *,
        precision: str = "f32",
        bucket_multiple: int = 64,
        stats_blend: float = 1.0,
        stabilize: bool = True,
    ):
        if not 0.0 <= stats_blend <= 1.0:
            raise ValueError(f"stats_blend must be in [0, 1], got {stats_blend}")
        self.params = params
        self.precision = canonical_compute_dtype(precision)
        self.bucket_multiple = bucket_multiple
        self.stats_blend = float(stats_blend)
        self.stabilize = stabilize
        self._stats: Optional[list] = None

        def _fwd(p, x_u8, stats):
            y = TransformerNet.apply(
                p, u8_to_network_jnp(x_u8), train=False,
                precision=self.precision,
                in_stats=stats, stats_blend=self.stats_blend)
            return network_to_u8_jnp(y)

        def _fwd_plain(p, x_u8):
            y = TransformerNet.apply(
                p, u8_to_network_jnp(x_u8), train=False,
                precision=self.precision)
            return network_to_u8_jnp(y)

        def _capture(p, x_u8):
            _, stats = TransformerNet.apply(
                p, u8_to_network_jnp(x_u8), train=False,
                precision=self.precision, return_stats=True)
            return stats

        self._fwd = jax.jit(_fwd)
        self._fwd_plain = jax.jit(_fwd_plain)
        self._capture = jax.jit(_capture)

    @classmethod
    def from_checkpoint(cls, path: str, *, style=None, **kw) -> "VideoStylizer":
        from fast_neural_style_transfer_tpu.infer.stylize import Stylizer
        from fast_neural_style_transfer_tpu.models.transformer import (
            bake_style,
            num_styles,
        )

        params = Stylizer.load_params(path)
        if num_styles(params) > 1:
            if style is None:
                raise ValueError(
                    f"{path} is a multi-style checkpoint: pass style=<index "
                    "or blend vector>")
            params = bake_style(params, style)
        elif style is not None:
            raise ValueError(f"style={style!r} given but {path} is single-style")
        return cls(params, **kw)

    # -- stabilization -------------------------------------------------------

    def _pad(self, x_u8: np.ndarray):
        x = jnp.asarray(x_u8)
        if x.dtype != jnp.uint8:
            raise TypeError(f"VideoStylizer wants uint8 frames, got {x.dtype}")
        return pad_to_multiple_reflect(x, self.bucket_multiple)

    def set_reference(self, frame_u8: np.ndarray) -> None:
        """Capture IN statistics from one (H, W, 3) uint8 reference frame
        (typically the clip's first frame). (1,1,1,C) moments broadcast over
        any subsequent frame batch of the same bucket."""
        padded, _ = self._pad(np.asarray(frame_u8)[None])
        self._stats = jax.tree.map(jnp.asarray, self._capture(self.params, padded))

    def reset_reference(self) -> None:
        """Drop the cached reference statistics so the next clip captures
        its own frame 0 (reuse one instance across unrelated clips)."""
        self._stats = None

    # -- forward -------------------------------------------------------------

    def raw_forward(self, frames_u8: jnp.ndarray) -> jnp.ndarray:
        """Public benchmarking hook: the jitted frozen-stats u8->u8 device
        program at an already bucket-aligned shape — the per-batch program
        ``stylize_frames`` replays, minus host pad/crop. ``set_reference``
        must have been called. Benches use this instead of reaching into
        ``_fwd``/``_stats`` (ADVICE r4)."""
        if self._stats is None:
            raise RuntimeError("raw_forward needs set_reference() first")
        if frames_u8.ndim != 4 or frames_u8.dtype != jnp.uint8:
            raise TypeError("raw_forward wants a uint8 NHWC frame batch")
        h, w = int(frames_u8.shape[1]), int(frames_u8.shape[2])
        if h % self.bucket_multiple or w % self.bucket_multiple:
            raise ValueError(
                f"raw_forward needs bucket-aligned H/W (multiple of "
                f"{self.bucket_multiple}); got {h}x{w}")
        return self._fwd(self.params, frames_u8, self._stats)

    def stylize_frames(
        self, frames_u8: np.ndarray, *, batch_size: int = 8
    ) -> np.ndarray:
        """(N, H, W, 3) uint8 frames -> (N, H, W, 3) stylized uint8.

        Captures the reference statistics from frame 0 on first use (unless
        ``set_reference`` was called, or ``stabilize=False``). A short
        final chunk repeats its last frame up to ``batch_size`` so the
        whole clip reuses one compiled program.
        """
        frames_u8 = np.asarray(frames_u8)
        if frames_u8.ndim != 4:
            raise ValueError(f"expected (N, H, W, 3) frames, got {frames_u8.shape}")
        if self.stabilize and self._stats is None:
            self.set_reference(frames_u8[0])
        out = np.empty_like(frames_u8)
        n = frames_u8.shape[0]
        for lo in range(0, n, batch_size):
            chunk = frames_u8[lo:lo + batch_size]
            pad_n = batch_size - chunk.shape[0]
            if pad_n and n > batch_size:
                # short tail: repeat the last frame up to the compiled batch
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], pad_n, axis=0)])
            padded, (h, w) = self._pad(chunk)
            if self.stabilize:
                y = self._fwd(self.params, padded, self._stats)
            else:
                y = self._fwd_plain(self.params, padded)
            y = np.asarray(y)[:, :h, :w, :]
            out[lo:lo + batch_size] = y[: out[lo:lo + batch_size].shape[0]]
        return out


def flicker_score(
    frames_u8: np.ndarray, mask: Optional[np.ndarray] = None
) -> float:
    """Mean absolute inter-frame difference of a clip (uint8 scale).

    Identical consecutive frames score 0. NOTE: on the whole frame this
    counts genuine content motion too, so it only isolates *normalization*
    flicker when the moving content is a small fraction of the frame. For a
    clean re-exposure measurement pass ``mask`` — an (H, W) bool array
    selecting static pixels (True = include): there, any inter-frame change
    is flicker by construction. With frozen IN statistics, static pixels
    outside the moving content's receptive field are bitwise stable (score
    exactly 0.0); per-frame normalization provably re-exposes them because
    the frame's global moments drift (DESIGN.md §13)."""
    f = np.asarray(frames_u8, np.float32)
    if f.shape[0] < 2:
        return 0.0
    d = np.abs(np.diff(f, axis=0))
    if mask is not None:
        mask = np.asarray(mask, bool)
        if mask.shape != f.shape[1:3]:
            raise ValueError(
                f"mask shape {mask.shape} != frame spatial shape {f.shape[1:3]}")
        d = d[:, mask, :]
    return float(d.mean())


# -- IO (frame dirs + GIF; no codec deps in this image) -----------------------


def read_frames(path: str, *, size: Optional[Tuple[int, int]] = None,
                max_frames: Optional[int] = None) -> np.ndarray:
    """Read a clip as (N, H, W, 3) uint8 from a frame directory (sorted
    ``.png/.jpg``) or an animated GIF. ``size`` = (H, W) resize."""
    from PIL import Image

    frames: List[np.ndarray] = []
    if os.path.isdir(path):
        # natural sort: frame_2.png orders before frame_10.png even without
        # zero padding (lexicographic order would corrupt both the output
        # ordering and the frame-0 reference-statistics capture)
        names = sorted(
            (f for f in os.listdir(path) if f.lower().endswith(_FRAME_EXTS)),
            key=_natural_key)
        if not names:
            raise FileNotFoundError(f"no frames under {path}")
        for name in names[:max_frames]:
            frames.append(_to_rgb(Image.open(os.path.join(path, name)), size))
    else:
        from PIL import ImageSequence

        with Image.open(path) as im:
            for i, frame in enumerate(ImageSequence.Iterator(im)):
                if max_frames is not None and i >= max_frames:
                    break
                frames.append(_to_rgb(frame, size))
    shapes = {f.shape for f in frames}
    if len(shapes) > 1:
        raise ValueError(
            f"frames disagree on shape ({sorted(shapes)}); pass size=(H, W)")
    return np.stack(frames)


def _to_rgb(im, size) -> np.ndarray:
    from PIL import Image

    im = im.convert("RGB")
    if size is not None:
        im = im.resize((size[1], size[0]), Image.BILINEAR)
    return np.asarray(im, np.uint8)


def write_frames(frames_u8: np.ndarray, path: str, *,
                 fps: float = 12.0) -> None:
    """Write (N, H, W, 3) uint8 to ``path``: a ``.gif`` animation, or a
    directory of ``frame_%05d.png``."""
    from PIL import Image

    if path.lower().endswith(".gif"):
        imgs = [Image.fromarray(f) for f in np.asarray(frames_u8)]
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        imgs[0].save(path, save_all=True, append_images=imgs[1:],
                     duration=max(1, int(round(1000.0 / fps))), loop=0)
    else:
        os.makedirs(path, exist_ok=True)
        for i, f in enumerate(np.asarray(frames_u8)):
            Image.fromarray(f).save(os.path.join(path, f"frame_{i:05d}.png"))


def stylize_video_file(
    model_path: str,
    content_path: str,
    output_path: str,
    *,
    size: Optional[Tuple[int, int]] = None,
    precision: str = "f32",
    style=None,
    stats_blend: float = 1.0,
    stabilize: bool = True,
    batch_size: int = 8,
    fps: float = 12.0,
    max_frames: Optional[int] = None,
) -> dict:
    """End-to-end: read clip -> stylize (stabilized) -> write clip.

    Returns a summary dict with frame count and flicker scores of the input
    and output (for logging; the CLI prints it).
    """
    frames = read_frames(content_path, size=size, max_frames=max_frames)
    vs = VideoStylizer.from_checkpoint(
        model_path, style=style, precision=precision,
        stats_blend=stats_blend, stabilize=stabilize)
    out = vs.stylize_frames(frames, batch_size=batch_size)
    write_frames(out, output_path, fps=fps)
    return {
        "frames": int(frames.shape[0]),
        "height": int(frames.shape[1]),
        "width": int(frames.shape[2]),
        "input_flicker": flicker_score(frames),
        "output_flicker": flicker_score(out),
        "stabilized": bool(stabilize),
        "stats_blend": float(stats_blend),
        "output": output_path,
    }
