"""Host input pipeline: shuffle, batch, normalize, prefetch to device.

TPU-first replacement for the reference's
``DataLoader(batch_size, shuffle=True, num_workers=2, pin_memory=True,
drop_last=True)`` (/root/reference/train.py:106-107):

- a thread pool decodes/resizes JPEGs concurrently (PIL releases the GIL in
  its decoders, so threads — not processes — suffice on TPU hosts);
- batches ship to device as raw uint8 (``transport="u8"``, default): 4x
  fewer host->device bytes than pre-normalized f32, with the /255 +
  ImageNet affine fused into the jitted step on device
  (train/step.py::normalize_u8_batch). The 2.2k-step soak showed transfer,
  not decode, bounds end-to-end host throughput (decode sustains 242 img/s
  on 8 threads; the u8 switch took the harness from 1.4 to 3.4 steps/s at
  b20). ``transport="f32"`` keeps the host-side normalize (native C++
  kernel) for callers that want network-space arrays on host;
- a background prefetcher keeps ``prefetch`` batches ahead, transferring each
  to device (optionally with a NamedSharding over the batch axis) while the
  previous step computes — the double-buffering SURVEY.md §2.2 calls for;
- under multi-host SPMD, each process decodes only its slice of the global
  batch and the global sharded array is assembled with
  ``jax.make_array_from_process_local_data`` (DCN never carries image bytes).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import jax
import numpy as np

from fast_neural_style_transfer_tpu.data.dataset import ImageFolderDataset
from fast_neural_style_transfer_tpu.utils.image_io import IMAGENET_MEAN, IMAGENET_STD

_SENTINEL = object()


class InputPipeline:
    def __init__(
        self,
        dataset: ImageFolderDataset,
        global_batch_size: int,
        *,
        seed: int = 0,
        num_workers: int = 8,
        prefetch: int = 2,
        sharding: Optional[jax.sharding.Sharding] = None,
        drop_last: bool = True,
        transport: str = "u8",
        pad_to_multiple: int = 0,
        num_data_shards: int = 1,
    ):
        """``pad_to_multiple`` > 0: pad each data shard's slice of the batch
        up to that multiple (repeating its last image) so TPU-hostile
        per-chip batch shapes (the reference's b20 — DESIGN.md §8) run at
        the padded shape's throughput; ``batch_mask_global`` marks the real
        rows and the train step masks pad rows out of every loss term
        exactly (train/step.py). ``num_data_shards`` is the mesh's data
        axis size — padding is laid out per shard so the padded global
        batch still splits contiguously across chips."""
        if transport not in ("u8", "f32"):
            raise ValueError(f"transport must be 'u8' or 'f32': {transport!r}")
        if prefetch < 1:
            # queue.Queue(maxsize=0) means UNBOUNDED — the opposite of "no
            # prefetch": the producer would transfer the whole epoch to
            # device ahead of the consumer
            raise ValueError(f"prefetch must be >= 1, got {prefetch}")
        if global_batch_size % jax.process_count() != 0:
            raise ValueError(
                f"global batch {global_batch_size} not divisible by "
                f"{jax.process_count()} processes"
            )
        if drop_last and len(dataset) < global_batch_size:
            # With drop_last a too-small dataset yields ZERO batches per
            # epoch; an unbounded run would then spin through empty epochs
            # forever with the consumer blocked on the queue. Fail loudly.
            raise ValueError(
                f"dataset has {len(dataset)} images but the global batch is "
                f"{global_batch_size}; with drop_last=True every epoch would "
                f"be empty. Lower --batch_size or pass drop_last=False "
                f"(wrap-around fill)."
            )
        self.dataset = dataset
        self.global_batch_size = global_batch_size
        self.local_batch_size = global_batch_size // jax.process_count()

        self.pad_to_multiple = int(pad_to_multiple)
        self.num_data_shards = int(num_data_shards)
        self.batch_mask_global: Optional[np.ndarray] = None
        self._per_shard = None
        if self.pad_to_multiple > 0:
            if global_batch_size % self.num_data_shards:
                raise ValueError(
                    f"global batch {global_batch_size} not divisible by "
                    f"{self.num_data_shards} data shards")
            per_shard = global_batch_size // self.num_data_shards
            padded = -(-per_shard // self.pad_to_multiple) * self.pad_to_multiple
            if padded != per_shard:
                shards_per_proc = self.num_data_shards // jax.process_count()
                if shards_per_proc * jax.process_count() != self.num_data_shards:
                    raise ValueError(
                        f"{self.num_data_shards} data shards not divisible "
                        f"by {jax.process_count()} processes")
                self._per_shard = (per_shard, padded, shards_per_proc)
                mask = np.zeros((self.num_data_shards, padded), np.float32)
                mask[:, :per_shard] = 1.0
                self.batch_mask_global = mask.reshape(-1)

        self.seed = seed
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.sharding = sharding
        self.drop_last = drop_last
        self.transport = transport

    # -- host-side batch assembly ------------------------------------------

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        rng = np.random.default_rng(self.seed + epoch)
        idx = rng.permutation(len(self.dataset))
        gbs = self.global_batch_size
        if self.drop_last:
            n_batches = len(idx) // gbs
            idx = idx[: n_batches * gbs]
        else:
            # static shapes under jit forbid a short final batch; wrap around
            # to fill it (standard TPU practice, no recompile)
            pad = -len(idx) % gbs
            if pad:
                # np.resize repeats the permutation cyclically, so this fills
                # correctly even when the dataset is smaller than one batch
                # (a single idx[:pad] slice would come up short there).
                idx = np.resize(idx, len(idx) + pad)
        return idx.reshape(-1, gbs)

    def _local_slice(self, batch_idx: np.ndarray) -> np.ndarray:
        p = jax.process_index()
        return batch_idx[p * self.local_batch_size : (p + 1) * self.local_batch_size]

    def _pad_shards(self, u8: np.ndarray) -> np.ndarray:
        """Pad each of this process's data-shard slices up to the padded
        per-shard batch (repeating the shard's last image; the values are
        irrelevant — the step masks them out of every loss — but a real
        image keeps all activations finite)."""
        per_shard, padded, shards_per_proc = self._per_shard
        x = u8.reshape((shards_per_proc, per_shard) + u8.shape[1:])
        x = np.concatenate(
            [x, np.repeat(x[:, -1:], padded - per_shard, axis=1)], axis=1)
        return x.reshape((shards_per_proc * padded,) + u8.shape[1:])

    def _make_batch(self, pool: ThreadPoolExecutor, batch_idx: np.ndarray) -> np.ndarray:
        imgs = list(pool.map(self.dataset.__getitem__, self._local_slice(batch_idx)))
        u8 = np.stack(imgs)  # (b, h, w, 3) uint8
        if self._per_shard is not None:
            u8 = self._pad_shards(u8)
        if self.transport == "u8":
            # Ship raw uint8; the jitted train step normalizes on device
            # (train/step.py::normalize_u8_batch) where XLA fuses the
            # /255 + ImageNet affine into the first conv's prologue.
            # 4x fewer host->device bytes than f32 — PCIe (or, in this dev
            # harness, the axon tunnel at ~45 MB/s) is the soak-measured
            # end-to-end bottleneck, not decode.
            return u8
        # fused /255 + ImageNet normalize: native C++ kernel when the
        # toolchain is present, NumPy otherwise (same numbers either way)
        from fast_neural_style_transfer_tpu import native

        return native.normalize_batch(u8, n_threads=min(self.num_workers, 8))

    def host_batches(self, num_epochs: Optional[int] = None) -> Iterator[np.ndarray]:
        """Local (per-process) normalized float32 NHWC batches, epoch-shuffled."""
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            epoch = 0
            while num_epochs is None or epoch < num_epochs:
                for batch_idx in self._epoch_indices(epoch):
                    yield self._make_batch(pool, batch_idx)
                epoch += 1

    # -- device prefetch ----------------------------------------------------

    def _to_device(self, host_batch: np.ndarray):
        if self.sharding is None:
            return jax.device_put(host_batch)
        global_b = (self.global_batch_size if self._per_shard is None
                    else self._per_shard[1] * self.num_data_shards)
        global_shape = (global_b,) + host_batch.shape[1:]
        return jax.make_array_from_process_local_data(
            self.sharding, host_batch, global_shape
        )

    def __iter__(self):
        return self.device_batches()

    def device_batches(self, num_epochs: Optional[int] = None):
        """Batches already transferred to device(s), ``prefetch`` deep."""
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put(item) -> bool:
            """Enqueue, re-checking stop so a consumer that exits early
            (total_steps bound, SIGTERM) never leaves this thread — and its
            prefetched device-resident batches — blocked on a full queue."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for hb in self.host_batches(num_epochs):
                    if stop.is_set():
                        return
                    if not put(self._to_device(hb)):
                        return
                put(_SENTINEL)
            except BaseException as e:  # surface worker failure to consumer
                put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _SENTINEL:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
