"""Preemption-safe checkpoint/resume (Orbax-backed).

The reference saves a pickle dict {model/optimizer/scheduler state_dicts,
iteration, loss, 3 loss weights} every 5000 iters
(/root/reference/train.py:269-283) and reconstructs schedules on resume with
math that contradicts the in-loop schedule (defect #5). Here the checkpoint is
the full ``TrainState`` pytree + step; LR and loss weights are pure functions
of the step (train/schedule.py) so nothing else needs persisting. Orbax gives
atomic writes + a latest-step pointer, which is the preemption-safety
SURVEY.md §5.3/§5.4 calls for on preemptible TPU VMs.

Interchange with the reference's ``.pth`` format lives in
``export/torch_convert.py``, not here.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from fast_neural_style_transfer_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, *, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True, enable_async_checkpointing=True
            ),
        )

    def save(self, step: int, state: TrainState) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state._asdict()))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, template: TrainState, step: Optional[int] = None) -> TrainState:
        """Restore into the structure/shardings of ``template``."""
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template._asdict())
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))
        return TrainState(**restored)

    def restore_params(self, template_params: Any, step: Optional[int] = None) -> Any:
        """Restore only the stylizer params, independent of the optimizer
        topology the run was saved with (a ``--grad_accum>1`` run wraps
        ``opt_state`` in ``optax.MultiSteps``; inference and warm-starts must
        not need to know that). Restores template-free, then validates tree
        structure and leaf shapes against ``template_params`` — pass ``None``
        to skip validation (callers that must inspect the restored shapes
        first, e.g. to detect a multi-style checkpoint's style count, then
        call ``validate_params`` themselves)."""
        import logging

        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        logger = logging.getLogger("absl")
        prev = logger.level
        logger.setLevel(logging.ERROR)  # silence the expected no-target note
        try:
            restored = self._mgr.restore(step)["params"]
        finally:
            logger.setLevel(prev)
        if template_params is not None:
            self.validate_params(template_params, restored)
        return restored

    @staticmethod
    def validate_params(template_params: Any, restored: Any) -> None:
        """Assert ``restored`` matches ``template_params``' tree + shapes."""
        t_flat, t_def = jax.tree_util.tree_flatten(template_params)
        r_flat, r_def = jax.tree_util.tree_flatten(restored)
        if t_def != r_def:
            raise ValueError(
                f"checkpoint params tree does not match the model: "
                f"{r_def} vs {t_def}"
            )
        for t, r in zip(t_flat, r_flat):
            if tuple(np.shape(r)) != tuple(np.shape(t)):
                raise ValueError(
                    f"checkpoint param shape {np.shape(r)} != model {np.shape(t)}"
                )

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()


def save_params_npz(params: Any, path: str) -> None:
    """Flat .npz export of stylizer params (the final-artifact analogue of the
    reference's ``style_transfer_final.pth`` — train.py:295-301)."""
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    out = {}
    for keypath, leaf in flat:
        key = "/".join(_key_str(k) for k in keypath)
        out[key] = np.asarray(leaf)
    np.savez(path, **out)


def load_params_npz(template: Any, path: str) -> Any:
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for keypath, leaf in flat:
        key = "/".join(_key_str(k) for k in keypath)
        arr = np.asarray(data[key])
        if arr.shape != tuple(leaf.shape):
            raise ValueError(f"shape mismatch for {key}: {arr.shape} vs {leaf.shape}")
        leaves.append(arr.astype(np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _key_str(k) -> str:
    if hasattr(k, "key"):
        return str(k.key)
    if hasattr(k, "idx"):
        return str(k.idx)
    return str(k)
