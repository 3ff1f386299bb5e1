"""Checkpoint/resume via orbax.

The reference cannot save mid-episode state at all (SURVEY.md §5:
checkpoint/resume absent; only completed-episode .npz dumps,
crafter/recorder.py:143-152).  Here the entire training state — params,
optimizer, PRNG keys, and the batched env state pytree — checkpoints and
restores bit-exactly, so a run resumes mid-episode.
"""

from __future__ import annotations

import pathlib
from typing import Any, Optional


class Checkpointer:
  """Thin orbax CheckpointManager wrapper for arbitrary pytrees."""

  def __init__(self, directory, keep: int = 3):
    import orbax.checkpoint as ocp
    self._ocp = ocp
    self._mgr = ocp.CheckpointManager(
        pathlib.Path(directory).absolute(),
        options=ocp.CheckpointManagerOptions(max_to_keep=keep))

  def save(self, step: int, state: Any) -> None:
    self._mgr.save(step, args=self._ocp.args.StandardSave(state))
    self._mgr.wait_until_finished()

  def restore_latest(self, template: Any) -> Optional[Any]:
    step = self._mgr.latest_step()
    if step is None:
      return None
    return self._mgr.restore(
        step, args=self._ocp.args.StandardRestore(template))

  @property
  def latest_step(self):
    return self._mgr.latest_step()
