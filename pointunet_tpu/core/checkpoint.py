"""Checkpointing via orbax with a best-metric policy.

Replaces the reference's tf.train.Saver snapshots written only when
validation mIoU improves (reference RandLANet.py:179-186, snap-<step>
naming; SaliencyAttention uses tensorpack ModelSaver + AutoResume,
train.py:269-275). Auto-resume = restore_latest() at startup.
"""
from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class BestMetricCheckpointer:
    """Saves step-named checkpoints plus a best-metric record."""

    def __init__(self, directory: str, max_to_keep: int = 100):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )
        # best checkpoints are pinned in their own single-slot manager:
        # the rolling max_to_keep window above would otherwise evict the
        # step best.json points at once enough later snapshots accumulate
        self._best_mngr = ocp.CheckpointManager(
            os.path.join(self.directory, "best"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=1, create=True
            ),
        )
        self._meta_path = os.path.join(self.directory, "best.json")

    def save(self, state: Any, step: int, metric: float | None = None):
        state = jax.tree_util.tree_map(np.asarray, state)
        self._mngr.save(step, args=ocp.args.StandardSave(state))
        self._mngr.wait_until_finished()
        if metric is not None:
            self._best_mngr.save(step, args=ocp.args.StandardSave(state))
            self._best_mngr.wait_until_finished()
            with open(self._meta_path, "w") as f:
                json.dump({"step": step, "metric": float(metric)}, f)

    def best_step(self) -> Optional[int]:
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                return int(json.load(f)["step"])
        return None

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def restore(self, step: int, template: Any) -> Any:
        target = jax.tree_util.tree_map(np.asarray, template)
        restored = self._mngr.restore(
            step, args=ocp.args.StandardRestore(target)
        )
        return jax.tree_util.tree_map(
            lambda t, r: type(t)(r) if np.isscalar(t) else r,
            template, restored,
            is_leaf=lambda x: not isinstance(x, (dict, list, tuple)),
        )

    def restore_latest(self, template: Any) -> Optional[Any]:
        step = self.latest_step()
        if step is None:
            return None
        return self.restore(step, template)

    def restore_best(self, template: Any) -> Optional[Any]:
        step = self.best_step()
        if step is None:
            return self.restore_latest(template)
        if self._best_mngr.latest_step() == step:
            target = jax.tree_util.tree_map(np.asarray, template)
            restored = self._best_mngr.restore(
                step, args=ocp.args.StandardRestore(target)
            )
            return jax.tree_util.tree_map(
                lambda t, r: type(t)(r) if np.isscalar(t) else r,
                template, restored,
                is_leaf=lambda x: not isinstance(x, (dict, list, tuple)),
            )
        return self.restore(step, template)

    def close(self):
        self._mngr.close()
        self._best_mngr.close()
