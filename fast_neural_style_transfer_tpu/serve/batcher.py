"""Online micro-batching for the serving path.

One 256-px forward costs ~0.8 ms of chip time on a v5e but every dispatch
pays host->device (tunnel/PCIe) plus dispatch overhead, and throughput
scales near-linearly with the batch dimension until the MXU saturates
(DESIGN.md SS8-9). The reference's serving story is one request at a time
through onnxruntime-web (/root/reference/README.md:5,26); the TPU-native
unit of work is a batch, so the server coalesces concurrent requests into
one NHWC batch before touching the chip.

Shape policy: requests are grouped by their (H, W) *bucket* (the same
``bucket_multiple`` rounding the Stylizer's compile cache uses), so a batch
only ever contains images that pad to identical dims and every bucket
reuses one compiled program. Mixed-size traffic degrades gracefully to
smaller batches instead of recompiling.
"""

from __future__ import annotations

import threading
import time
from collections import deque
from concurrent.futures import Future
from typing import Callable, Deque, List, Optional, Tuple

import numpy as np

from fast_neural_style_transfer_tpu.core.shapes import bucket_hw

__all__ = ["MicroBatcher", "QueueFull", "ServingStats"]


class QueueFull(RuntimeError):
    """Backpressure signal: more than ``max_pending`` requests in flight."""


def _pad_to(img: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """Reflect-pad one HWC image to (ph, pw) — numpy twin of
    core.shapes.pad_to_multiple_reflect (edge mode when pad >= dim)."""
    h, w, _ = img.shape
    dh, dw = ph - h, pw - w
    if dh == 0 and dw == 0:
        return img
    mode = "reflect" if (dh < h and dw < w) else "edge"
    return np.pad(img, ((0, dh), (0, dw), (0, 0)), mode=mode)


class ServingStats:
    """Lock-protected serving counters + a latency reservoir.

    ``snapshot()`` is what ``GET /stats`` returns: request/batch counts,
    mean batch occupancy (the batching win), and e2e latency quantiles over
    the last ``window`` requests.
    """

    def __init__(self, window: int = 1024):
        self._lock = threading.Lock()
        self._lat: Deque[float] = deque(maxlen=window)
        self.requests = 0
        self.batches = 0
        self.batched_images = 0
        self.errors = 0
        self.rejected = 0

    def record_batch(self, n: int) -> None:
        with self._lock:
            self.batches += 1
            self.batched_images += n

    def record_request(self, latency_s: float, ok: bool) -> None:
        with self._lock:
            self.requests += 1
            if ok:
                self._lat.append(latency_s)
            else:
                self.errors += 1

    def record_rejected(self) -> None:
        with self._lock:
            self.rejected += 1

    def snapshot(self) -> dict:
        with self._lock:
            lat = sorted(self._lat)
            q = (lambda p: lat[min(len(lat) - 1, int(p * len(lat)))]
                 if lat else None)
            return {
                "requests": self.requests,
                "errors": self.errors,
                "rejected": self.rejected,
                "batches": self.batches,
                "batched_images": self.batched_images,
                "mean_batch_occupancy": (
                    self.batched_images / self.batches if self.batches else None),
                "latency_p50_ms": None if q(0.5) is None else q(0.5) * 1e3,
                "latency_p95_ms": None if q(0.95) is None else q(0.95) * 1e3,
            }


class MicroBatcher:
    """Coalesce concurrent single-image requests into device batches.

    ``forward``: a callable taking one uint8 NHWC batch of identical dims
    and returning the stylized uint8 NHWC batch (``Stylizer.stylize_u8`` or
    ``ArbitraryStylizer.stylize_u8`` — both already cache one compiled
    program per shape bucket).

    The dispatcher takes the oldest request, then waits up to
    ``max_wait_ms`` for more requests of the same shape bucket (returning
    early the moment ``max_batch`` are on hand). FIFO on the head request,
    so mixed-size traffic cannot starve a bucket.
    """

    def __init__(
        self,
        forward: Callable[[np.ndarray], np.ndarray],
        *,
        max_batch: int = 8,
        max_wait_ms: float = 5.0,
        max_pending: int = 256,
        bucket_multiple: int = 64,
    ):
        if max_batch < 1:
            raise ValueError(f"max_batch must be >= 1, got {max_batch}")
        self._forward = forward
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1e3
        self.max_pending = max_pending
        self.bucket_multiple = bucket_multiple
        self.stats = ServingStats()
        self._lock = threading.Lock()
        self._cond = threading.Condition(self._lock)
        # entries: (bucket_key, img_u8, future)
        self._queue: Deque[Tuple[Tuple[int, int], np.ndarray, Future]] = deque()
        self._closed = False
        self._thread = threading.Thread(
            target=self._loop, name="fnst-microbatcher", daemon=True)
        self._thread.start()

    # -- client side --------------------------------------------------------

    def submit(self, img_u8: np.ndarray) -> "Future[np.ndarray]":
        """Enqueue one HWC uint8 image; resolves to the stylized image."""
        if img_u8.ndim != 3 or img_u8.shape[-1] != 3:
            raise ValueError(f"expected (H, W, 3) uint8, got {img_u8.shape}")
        if img_u8.dtype != np.uint8:
            raise TypeError(f"expected uint8, got {img_u8.dtype}")
        key = bucket_hw(img_u8.shape[0], img_u8.shape[1], self.bucket_multiple)
        fut: Future = Future()
        with self._cond:
            if self._closed:
                raise RuntimeError("batcher is closed")
            if len(self._queue) >= self.max_pending:
                self.stats.record_rejected()
                raise QueueFull(
                    f"{len(self._queue)} requests pending (max_pending="
                    f"{self.max_pending})")
            self._queue.append((key, img_u8, fut))
            self._cond.notify()
        return fut

    def close(self) -> None:
        """Stop the dispatcher; fail any requests still queued."""
        with self._cond:
            self._closed = True
            self._cond.notify_all()
        self._thread.join(timeout=10)
        with self._cond:
            leftovers = list(self._queue)
            self._queue.clear()
        for _, _, fut in leftovers:
            fut.set_exception(RuntimeError("batcher closed"))

    # -- dispatcher side ----------------------------------------------------

    def _take_matching(self, key: Tuple[int, int], limit: int) -> List:
        """Pop up to ``limit`` same-bucket entries, preserving the relative
        order of everything left behind. Caller holds the lock."""
        taken, rest = [], deque()
        while self._queue and len(taken) < limit:
            entry = self._queue.popleft()
            (taken if entry[0] == key else rest).append(entry)
        rest.extend(self._queue)
        self._queue = rest
        return taken

    def _count_matching(self, key: Tuple[int, int]) -> int:
        return sum(1 for e in self._queue if e[0] == key)

    def _loop(self) -> None:
        while True:
            with self._cond:
                while not self._queue and not self._closed:
                    self._cond.wait()
                if self._closed:
                    return
                key = self._queue[0][0]
                # Linger for co-batchable requests only when under-full and
                # the window is positive; the head request's clock started
                # at submit so the linger is bounded by max_wait total.
                if (self.max_wait_s > 0
                        and self._count_matching(key) < self.max_batch):
                    deadline = time.monotonic() + self.max_wait_s
                    while (self._count_matching(key) < self.max_batch
                           and not self._closed):
                        remaining = deadline - time.monotonic()
                        if remaining <= 0:
                            break
                        self._cond.wait(timeout=remaining)
                if self._closed:
                    return
                group = self._take_matching(key, self.max_batch)
            self._run_batch(key, group)

    def _run_batch(self, key: Tuple[int, int], group: List) -> None:
        ph, pw = key
        try:
            batch = np.stack([_pad_to(img, ph, pw) for _, img, _ in group])
            out = np.asarray(self._forward(batch))
            self.stats.record_batch(len(group))
            for i, (_, img, fut) in enumerate(group):
                h, w, _ = img.shape
                fut.set_result(out[i, :h, :w, :])
        except Exception as e:  # noqa: BLE001 — delivered to each caller
            for _, _, fut in group:
                if not fut.done():
                    fut.set_exception(e)
