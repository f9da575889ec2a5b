"""Checkpoint / resume (orbax-backed).

The reference has **no** model/optimizer checkpointing (SURVEY §5 — its only
persistent artifacts are partition caches and CSV logs). This adds the
missing capability as a first-class component: async-capable orbax
checkpointing of the full train state pytree (params / optimizer state /
batch stats / step / RNG key), with retention and resume.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

__all__ = ["CheckpointManager"]


class CheckpointManager:
    """Thin orbax wrapper with a stable interface.

    Usage::

        ckpt = CheckpointManager(dir, max_to_keep=3)
        state = ckpt.restore_or(state)          # resume if anything saved
        ...
        ckpt.save(step, state)                  # periodically
        ckpt.close()
    """

    def __init__(self, directory: str, max_to_keep: int = 3, save_interval: int = 1):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, save_interval_steps=save_interval
            ),
        )

    def save(self, step: int, state: Any, *, force: bool = False) -> bool:
        return self._mgr.save(
            step, args=self._ocp.args.StandardSave(state), force=force
        )

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure of ``state_template``."""
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        return self._mgr.restore(
            step, args=self._ocp.args.StandardRestore(state_template)
        )

    def restore_or(self, state: Any) -> tuple[Any, int]:
        """(state, start_step): restored if a checkpoint exists, else as given."""
        step = self._mgr.latest_step()
        if step is None:
            return state, 0
        return self.restore(state, step), step + 1

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()
