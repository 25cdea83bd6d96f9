"""Checkpointing (reference layer L7, SURVEY.md §5.4).

The reference torch.saves state_dict bundles and parses the resume epoch out
of the checkpoint FILENAME (v1:1179-1191, 1352-1363). Here checkpoints are
Orbax with explicit step metadata; `parse_epoch_from_filename` is kept as a
parity helper so reference-style `...epoch_N.pt` paths still resume correctly
through the CLI.
"""
from __future__ import annotations

import os
import re
from typing import Any, Optional

import orbax.checkpoint as ocp


def parse_epoch_from_filename(path: str) -> Optional[int]:
    """`.../conditional_diffusion_epoch_450.pt` -> 450 (v1:1352-1363)."""
    m = re.search(r"epoch_(\d+)", os.path.basename(path))
    return int(m.group(1)) if m else None


class CheckpointManager:
    """Thin Orbax wrapper: save(step, pytree) / restore(step|latest)."""

    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, tree: Any, force: bool = True) -> None:
        if step in self._mgr.all_steps():
            # Re-saving a step (e.g. final save right after a cadence save at
            # the same epoch) overwrites rather than raising.
            self._mgr.delete(step)
        self._mgr.save(step, args=ocp.args.StandardSave(tree), force=force)
        self._mgr.wait_until_finished()

    def restore(self, step: Optional[int] = None, like: Any = None) -> Any:
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        if like is not None:
            return self._mgr.restore(step, args=ocp.args.StandardRestore(like))
        return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def exists(self) -> bool:
        return self.latest_step() is not None
