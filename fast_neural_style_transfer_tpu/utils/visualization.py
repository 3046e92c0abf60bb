"""Loss-curve plotting from the structured metrics log.

The reference committed hand-made loss-curve PNGs as README assets
(total_loss.png, style_loss.png, tv_loss.png, feature_reconstruction_loss.png)
and left utils/visualization.py empty (SURVEY.md §2.1 #17, §5.5). This module
actually generates them from ``metrics.jsonl`` written by the training loop.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

DEFAULT_CURVES = ("loss", "content_loss", "style_loss", "tv_loss")


def read_metrics(jsonl_path: str) -> List[Dict]:
    """Parse metrics.jsonl tolerantly: the file is appended to across
    resumes, so (a) a preemption can truncate the final line mid-write —
    skip unparseable lines instead of failing the whole plot — and (b) a
    resume from an earlier checkpoint can re-log steps already present —
    keep the LAST record per step (the one that superseded the rolled-back
    range) and return records in step order."""
    by_step: Dict = {}
    order = 0
    with open(jsonl_path) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue  # torn final line from a preempted writer
            by_step[rec.get("step", order)] = rec
            order += 1
    return [by_step[s] for s in sorted(by_step)]


def plot_loss_curves(
    jsonl_path: str,
    output_dir: Optional[str] = None,
    curves: Sequence[str] = DEFAULT_CURVES,
    *,
    log_scale: bool = True,
) -> List[str]:
    """Write one PNG per curve (named ``<curve>.png`` like the reference's
    assets); returns the written paths."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    records = read_metrics(jsonl_path)
    if not records:
        raise ValueError(f"no metric records in {jsonl_path}")
    output_dir = output_dir or os.path.dirname(jsonl_path) or "."
    os.makedirs(output_dir, exist_ok=True)
    steps = [r["step"] for r in records]

    written = []
    for curve in curves:
        values = [r.get(curve) for r in records]
        if any(v is None for v in values):
            continue
        fig, ax = plt.subplots(figsize=(7, 4))
        ax.plot(steps, values, linewidth=1.2)
        ax.set_xlabel("step")
        ax.set_ylabel(curve)
        if log_scale and min(values) > 0:
            ax.set_yscale("log")
        ax.set_title(curve.replace("_", " "))
        ax.grid(True, alpha=0.3)
        path = os.path.join(output_dir, f"{curve}.png")
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        written.append(path)
    return written
