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
        sharding: Optional[Any] = None,
        preserve_color: str = "off",
    ):
        """``sharding``: optional ``jax.sharding.Sharding`` for input
        batches (e.g. ``make_mesh_plan().batch_sharding``) — batches whose
        leading dim divides the mesh run data-parallel across chips, with
        params replicated; XLA handles the rest. Single-image and
        non-divisible batches fall back to the default device.

        ``preserve_color='luma'`` folds Gatys color control into the jitted
        u8 roundtrip (the content is already in-graph): stylized luminance
        + content chrominance, zero extra transfers. Only meaningful on the
        u8 path — the network-space ``__call__`` has no content reference
        after its caller normalizes."""
        if preserve_color not in ("off", "luma"):
            raise ValueError(
                f"preserve_color must be 'off' or 'luma' (got "
                f"{preserve_color!r})")
        self.preserve_color = preserve_color
        self.bucket_multiple = bucket_multiple
        if precision == "int8":
            # int8 MXU path: weights quantized once here, activations per
            # layer inside the jitted forward. 4x smaller weights; wall
            # clock ~parity with bf16 on v5e (the forward is fusion-bound,
            # not MXU-bound) — measurements in infer/quantized.py.
            from fast_neural_style_transfer_tpu.infer.quantized import (
                apply_int8,
                quantize_params,
            )

            self.params = quantize_params(params)
            self.precision = canonical_compute_dtype("f32")  # non-conv math
            self._apply = lambda p, x: apply_int8(p, x)
        else:
            self.params = params
            self.precision: Precision = canonical_compute_dtype(precision)
            self._apply = lambda p, x: TransformerNet.apply(
                p, x, train=False, precision=self.precision)
        self.sharding = sharding
        if sharding is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            self.params = jax.device_put(
                self.params,
                NamedSharding(sharding.mesh, PartitionSpec()))
        self._fwd = jax.jit(self._apply)
        self._fwd_u8 = jax.jit(self._u8_roundtrip)

    def _place(self, padded: jnp.ndarray) -> jnp.ndarray:
        """Shard a batch over the mesh's data axis when it divides."""
        from fast_neural_style_transfer_tpu.parallel.mesh import place_on_data_axis

        return place_on_data_axis(self.sharding, padded)

    def _u8_roundtrip(self, p, x_u8):
        """uint8 in -> uint8 out, entirely on device: /255 + ImageNet
        normalize, forward, de-normalize, clip, round. Keeps both PCIe (or
        tunnel) directions at 1/4 the f32 bytes; the affines fuse into the
        first/last convs."""
        from fast_neural_style_transfer_tpu.utils.image_io import (
            network_to_u8_jnp,
            u8_to_network_jnp,
        )

        y = self._apply(p, u8_to_network_jnp(x_u8))
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
            y01 = luminance_transfer(
                jnp.clip(y * std + mean, 0.0, 1.0),
                x_u8.astype(jnp.float32) / 255.0)
            return jnp.clip(jnp.round(y01 * 255.0), 0, 255).astype(jnp.uint8)
        return network_to_u8_jnp(y)

    # -- constructors -------------------------------------------------------

    @staticmethod
    def load_params(path: str) -> Any:
        """Load raw stylizer params from .npz (native), Orbax checkpoint dir,
        or reference-style torch .pth (via export/torch_convert). Multi-style
        checkpoints come back with their (S, C) conditional-IN banks intact —
        ``from_checkpoint`` is the style-selecting entry point."""
        if path.endswith(".npz"):
            from fast_neural_style_transfer_tpu.train.checkpoint import load_params_npz

            # peek the style count so the validation template matches:
            # multi-style checkpoints store (S, C) IN affines
            with np.load(path) as z:
                g = z["norm1/gamma"]
                ns = int(g.shape[0]) if g.ndim == 2 else 1
            template = TransformerNet.init(jax.random.PRNGKey(0), num_styles=ns)
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
            import os

            if not os.path.isdir(path):
                # CheckpointManager would mkdir the path as a side effect and
                # then complain about the empty directory it just created
                raise FileNotFoundError(
                    f"no such checkpoint: {path} (expected a .npz/.pth file "
                    "or an Orbax checkpoint directory)"
                )
            from fast_neural_style_transfer_tpu.train.checkpoint import CheckpointManager

            # params-only restore: works regardless of the optimizer topology
            # the run used (e.g. --grad_accum>1 wraps opt_state in MultiSteps,
            # which a default-optimizer template could not restore). Restore
            # raw first, then validate against a template with the restored
            # style count.
            from fast_neural_style_transfer_tpu.models.transformer import (
                num_styles as _num_styles,
            )

            mgr = CheckpointManager(path)
            params = mgr.restore_params(None)
            mgr.validate_params(
                TransformerNet.init(
                    jax.random.PRNGKey(0), num_styles=_num_styles(params)
                ),
                params,
            )
        return jax.tree.map(jnp.asarray, params)

    @classmethod
    def from_checkpoint(cls, path: str, *, style=None, **kw) -> "Stylizer":
        """Load a checkpoint and build a Stylizer.

        ``style`` (multi-style checkpoints): an int style index, or a
        length-S weight vector that convexly blends styles. The selection is
        baked into standard single-style params (models/transformer.py
        ``bake_style``) so every downstream path — u8 roundtrip, int8,
        spatial sharding, export — runs unchanged. Required when the
        checkpoint is multi-style; rejected when it is single-style.
        """
        from fast_neural_style_transfer_tpu.models.transformer import (
            bake_style,
            num_styles,
        )

        params = cls.load_params(path)
        s = num_styles(params)
        if s > 1:
            if style is None:
                raise ValueError(
                    f"{path} is a {s}-style checkpoint: pass style=<index "
                    f"0..{s - 1}> or a length-{s} blend-weight vector"
                )
            params = bake_style(params, style)
        elif style is not None:
            raise ValueError(
                f"style={style!r} given but {path} is a single-style "
                "checkpoint"
            )
        return cls(params, **kw)

    # -- forward ------------------------------------------------------------

    def __call__(self, batch: np.ndarray) -> np.ndarray:
        """Network-space NHWC in -> network-space NHWC out (same H, W)."""
        x = jnp.asarray(batch, jnp.float32)
        padded, (h, w) = pad_to_multiple_reflect(x, self.bucket_multiple)
        out = self._fwd(self.params, self._place(padded))
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

    def stylize_u8(self, image_u8: np.ndarray) -> np.ndarray:
        """Raw uint8 (H,W,3)/(N,H,W,3) in -> stylized uint8 out.

        The production fast path: normalize/denormalize happen on device so
        host<->device carries uint8 both ways (4x fewer bytes than the f32
        network-space API). Values match ``stylize`` exactly up to the final
        *255 rounding (regression-tested)."""
        squeeze = image_u8.ndim == 3
        x = jnp.asarray(image_u8[None] if squeeze else image_u8)
        if x.dtype != jnp.uint8:
            raise TypeError(f"stylize_u8 wants uint8, got {x.dtype}")
        padded, (h, w) = pad_to_multiple_reflect(x, self.bucket_multiple)
        out = np.asarray(
            self._fwd_u8(self.params, self._place(padded)))[:, :h, :w, :]
        return out[0] if squeeze else out

    def raw_forward_u8(self, x_u8: jnp.ndarray) -> jnp.ndarray:
        """Public benchmarking hook: the jitted u8->u8 device program at an
        already bucket-aligned shape — no host-side pad/crop/placement, input
        and output stay device arrays (so output can feed back as input for
        chained-timing). Benches use this instead of reaching into
        ``_fwd_u8`` so internal refactors can't silently change what they
        measure (ADVICE r4)."""
        if x_u8.ndim != 4 or x_u8.dtype != jnp.uint8:
            raise TypeError("raw_forward_u8 wants a uint8 NHWC batch")
        h, w = int(x_u8.shape[1]), int(x_u8.shape[2])
        if h % self.bucket_multiple or w % self.bucket_multiple:
            raise ValueError(
                f"raw_forward_u8 needs bucket-aligned H/W (multiple of "
                f"{self.bucket_multiple}); got {h}x{w} — use stylize_u8 for "
                "arbitrary sizes")
        return self._fwd_u8(self.params, x_u8)


def stylize_image_file(
    model_path: str,
    content_path: str,
    output_path: str,
    *,
    size: Optional[Tuple[int, int]] = None,
    precision: str = "f32",
    style=None,
    preserve_color: str = "off",
) -> str:
    """File-in/file-out single-image path (reference test_inference,
    inference.py:27-61 — minus its preprocessing bug).

    Uses the uint8 device-roundtrip (normalize and denormalize fused into
    the jitted forward): same canonical preprocess as ``load_image``
    (defect #7 fix), 4x fewer transfer bytes each way. ``style``: index or
    blend weights for multi-style checkpoints (Stylizer.from_checkpoint).
    ``preserve_color='luma'``: keep only the stylized LUMINANCE and take
    chrominance from the content (Gatys color control; utils/color.py)."""
    from PIL import Image

    from fast_neural_style_transfer_tpu.utils.image_io import (
        decode_image,
        resize_image,
    )

    stylizer = Stylizer.from_checkpoint(model_path, precision=precision,
                                        style=style,
                                        preserve_color=preserve_color or "off")
    u8 = decode_image(content_path)
    if size is not None:
        u8 = resize_image(u8, size)
    out = stylizer.stylize_u8(u8)
    Image.fromarray(out).save(output_path)
    return output_path


def stylize_directory(
    model_path: str,
    content_dir: str,
    output_dir: str,
    *,
    size: Optional[Tuple[int, int]] = None,
    batch_size: int = 16,
    precision: str = "f32",
    num_workers: int = 8,
    data_parallel: bool = False,
    style=None,
    skip_bad_images: bool = False,
    preserve_color: str = "off",
) -> list:
    """Stylize every image under ``content_dir`` into ``output_dir``.

    Throughput path for bulk jobs: threaded decode, same-shape images
    grouped and run as uint8 device batches (one compile per shape
    bucket; short final chunks are wrap-padded to ``batch_size`` so every
    chunk reuses the same program; the chip sustains ~1.5k 256^2 images/s
    batched vs ~1/ms single — bench.py). Host and device work are
    software-pipelined — decode of chunk N+1 and the JPEG encodes of chunk
    N-1 overlap chunk N's device run (measured on 192 256² images through
    the tunnel: 14.5 -> 11.8 s end-to-end, +23%; the win grows on real
    hosts where the device leg is not transfer-inflated). ``data_parallel=True`` shards
    each batch over the mesh's ``data`` axis (params replicated) for
    multi-chip serving; ``batch_size`` must divide by the data-axis size.
    Output paths mirror the input paths relative to ``content_dir``
    (subdirectories are recreated, so same-named files in different
    folders never clobber each other; a residual stem collision like
    ``x.jpg`` vs ``x.png`` in one folder gets a numeric suffix). Returns
    the written paths.
    """
    from fast_neural_style_transfer_tpu.data.dataset import scan_image_files

    files = scan_image_files(content_dir)
    sharding = None
    if data_parallel:
        from fast_neural_style_transfer_tpu.parallel import make_mesh_plan

        plan = make_mesh_plan()
        plan.check_batch(batch_size)
        sharding = plan.batch_sharding
    stylizer = Stylizer.from_checkpoint(model_path, precision=precision,
                                        sharding=sharding, style=style,
                                        preserve_color=preserve_color)
    return pipeline_directory(
        stylizer.stylize_u8, files, content_dir, output_dir,
        size=size, batch_size=batch_size, num_workers=num_workers,
        skip_bad_images=skip_bad_images,
    )


def pipeline_directory(
    fwd_u8,
    files: list,
    content_dir: str,
    output_dir: str,
    *,
    size: Optional[Tuple[int, int]] = None,
    batch_size: int = 16,
    num_workers: int = 8,
    skip_bad_images: bool = False,
) -> list:
    """The bulk-job engine shared by every model family: decode / device-run
    / JPEG-encode software pipeline over ``files``, with shape-bucket
    grouping and wrap-padded final chunks. ``fwd_u8`` maps a uint8 NHWC
    batch to a stylized uint8 batch (e.g. ``Stylizer.stylize_u8`` or the
    AdaIN ``ArbitraryStylizer.stylize_u8``).

    ``skip_bad_images``: a corrupt file normally fails the whole job
    (default — surfacing errors beats silently dropping work); with True it
    is logged and skipped so one bad JPEG cannot kill a 100k-image run. The
    returned list keeps a ``None`` at each skipped input's position."""
    import os
    from concurrent.futures import ThreadPoolExecutor

    from PIL import Image

    from fast_neural_style_transfer_tpu.utils.image_io import (
        decode_image,
        resize_image,
    )

    os.makedirs(output_dir, exist_ok=True)

    def dec(path):
        u8 = decode_image(path)
        return resize_image(u8, size) if size is not None else u8

    # group equal shapes WITHOUT decoding pixels (PIL reads only the header
    # for .size) so a 100k-image bulk job never holds more than one chunk of
    # decoded images in host RAM; with a fixed --size everything is one group
    groups: Dict[Tuple[int, int], list] = {}
    if size is not None:
        groups[tuple(size)] = list(range(len(files)))
    else:
        for i, f in enumerate(files):
            try:
                with Image.open(f) as im:
                    w, h = im.size
            except Exception as e:
                if not skip_bad_images:
                    raise
                print(f"skipping unreadable {f}: {e!r}", flush=True)
                continue
            groups.setdefault((h, w), []).append(i)

    # one output path per input, collision-free: mirror the relative path
    # under output_dir, then uniquify any residual same-stem clash
    out_paths = [None] * len(files)
    used = set()
    for i, f in enumerate(files):
        rel_stem = os.path.splitext(os.path.relpath(f, content_dir))[0]
        path = os.path.join(output_dir, f"{rel_stem}_stylized.jpg")
        n = 1
        while path in used:
            path = os.path.join(output_dir, f"{rel_stem}_stylized_{n}.jpg")
            n += 1
        used.add(path)
        out_paths[i] = path

    # Software pipeline: while chunk N runs on device, chunk N+1 decodes on
    # the pool and chunk N-1's JPEGs are being written by pool workers — the
    # chip never waits on host decode or (previously sequential) encodes.
    # In-flight memory stays bounded: one decoded chunk ahead, save futures
    # drained to <= 2 chunks behind.
    all_chunks = [
        idxs[at:at + batch_size]
        for idxs in groups.values()
        for at in range(0, len(idxs), batch_size)
    ]

    written = [None] * len(files)
    with ThreadPoolExecutor(max_workers=num_workers) as pool:
        def try_dec(i):
            try:
                return i, dec(files[i])
            except Exception as e:
                if not skip_bad_images:
                    raise
                print(f"skipping undecodable {files[i]}: {e!r}", flush=True)
                return i, None

        def prep(chunk):
            results = list(pool.map(try_dec, chunk))
            kept = [i for i, u8 in results if u8 is not None]
            if not kept:
                return kept, None
            imgs = dict(results)
            # wrap-pad short chunks to a full batch: one compiled program
            # per shape bucket, and the leading dim always divides the
            # data axis under data_parallel
            fill = kept + kept[: batch_size - len(kept)]
            while len(fill) < batch_size:
                fill = fill + kept[: batch_size - len(fill)]
            return kept, np.stack([imgs[i] for i in fill])

        def save_one(i, out):
            path = out_paths[i]
            os.makedirs(os.path.dirname(path), exist_ok=True)
            Image.fromarray(out).save(path)
            written[i] = path

        save_futures = []
        next_batch = pool.submit(prep, all_chunks[0]) if all_chunks else None
        for n, chunk in enumerate(all_chunks):
            kept, batch = next_batch.result()
            if n + 1 < len(all_chunks):
                next_batch = pool.submit(prep, all_chunks[n + 1])
            if batch is None:  # whole chunk skipped as undecodable
                continue
            outs = fwd_u8(batch)[: len(kept)]
            save_futures.extend(
                pool.submit(save_one, i, out) for i, out in zip(kept, outs)
            )
            while len(save_futures) > 2 * batch_size:
                save_futures.pop(0).result()  # bound memory + surface errors
        for f in save_futures:
            f.result()
    return written
