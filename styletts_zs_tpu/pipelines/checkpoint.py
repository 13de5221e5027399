"""Checkpoint/resume via orbax (SURVEY.md §5.4).

Stage boundaries (1 -> 2 -> 3) are checkpoint handoffs; restore is
sharding-aware (a 1-chip checkpoint restores onto any mesh — params are
replicated or re-sharded by the caller's sharding tree).
"""
from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, *, keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True, enable_async_checkpointing=True),
        )

    def save(self, step: int, tree: Any):
        self._mgr.save(step, args=ocp.args.StandardSave(tree))

    def restore(self, step: Optional[int] = None, *, like: Any = None):
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        if like is not None:
            return self._mgr.restore(step,
                                     args=ocp.args.StandardRestore(like))
        return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


def save_params(path: str, params):
    """One-shot param save (stage handoff artifact)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()


def load_params(path: str, like=None):
    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        return ckptr.restore(os.path.abspath(path), target=like)
    return ckptr.restore(os.path.abspath(path))
