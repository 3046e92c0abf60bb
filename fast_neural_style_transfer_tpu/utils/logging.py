"""Structured metric logging (replaces the reference's print-based logging).

The reference prints running loss means + LR every 100 iterations
(/root/reference/train.py:217-234). This logger keeps the same cadence
semantics but emits structured JSONL alongside the console line, giving the
observability subsystem SURVEY.md §5.5 calls for. Steps/sec is measured
host-side around the (async-dispatched) device step.
"""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict
from typing import Any, Dict, Optional


class MetricLogger:
    def __init__(self, jsonl_path: Optional[str] = None, print_every: int = 100):
        self.jsonl_path = jsonl_path
        self.print_every = print_every
        self._pending: list = []  # per-step metric dicts, possibly device arrays
        self._t0 = time.perf_counter()
        if jsonl_path:
            os.makedirs(os.path.dirname(jsonl_path) or ".", exist_ok=True)
            # truncate on fresh start is the caller's choice; we append
            self._fh = open(jsonl_path, "a", buffering=1)
        else:
            self._fh = None

    def update(self, metrics: Dict[str, Any]) -> None:
        """Record one step's metrics WITHOUT materializing device values —
        converting here would force a device->host sync every training step
        and serialize the async dispatch pipeline. Values are fetched once
        per flush (every ``print_every`` steps)."""
        self._pending.append(metrics)

    @property
    def pending(self) -> int:
        return len(self._pending)

    def should_log(self, step: int) -> bool:
        return step % self.print_every == 0 and self._pending

    def flush(self, step: int, extra: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
        """Emit running means since the last flush; reset accumulators.
        This is the (only) point that synchronizes on the device metrics —
        ONE batched device_get of everything pending, not a float() per
        scalar (print_every x num_metrics serial round trips would each pay
        the full transfer latency; measured ~30 ms apiece on the tunneled
        dev TPU)."""
        import jax

        pending = jax.device_get(self._pending)
        sums: Dict[str, float] = defaultdict(float)
        for m in pending:
            for k, v in m.items():
                sums[k] += float(v)
        count = len(self._pending)
        now = time.perf_counter()
        means = {k: v / max(count, 1) for k, v in sums.items()}
        record = {
            "step": step,
            "steps_per_sec": count / max(now - self._t0, 1e-9),
            **means,
            **(extra or {}),
        }
        if self._fh:
            self._fh.write(json.dumps(record) + "\n")
        parts = [f"step {step}"]
        for k, v in record.items():
            if k != "step" and isinstance(v, float):
                parts.append(f"{k}={v:.6g}")
        print("  ".join(parts), flush=True)
        self._pending.clear()
        self._t0 = now
        return record

    def close(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None
