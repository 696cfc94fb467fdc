"""Checkpoint/resume: orbax-backed pytree checkpoints.

The reference uses tf.train.Saver with a hand-built variable list
(trainables + BN moving stats + Adam slots + global_step, las/utils.py:69-82),
epoch-named files `las_E{epoch}` keeping 30 (train.py:82-90, :128-132), and
needs a variable-name remap to reuse train weights in the flat decode graph
(beam_search.py:252-270).

Pytree checkpoints make all of that structural: the whole TrainState
(params + BN state + optimizer state + step + rng) is one tree, epochs are
orbax steps, and any graph that takes the same pytree restores it with zero
name translation.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

# orbax emits copious INFO logs per save/restore; keep driver logs readable
for _name in ("orbax", "orbax.checkpoint", "absl"):
    logging.getLogger(_name).setLevel(logging.WARNING)


class CheckpointManager:
    """Epoch-indexed TrainState checkpoints (reference: `las_E{epoch}`)."""

    def __init__(self, directory: str, max_to_keep: int = 30):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, epoch: int, state: Any, block: bool = True) -> None:
        """Save, overwriting an existing checkpoint for the same epoch
        (tf.train.Saver semantics: resuming and re-saving epoch N must not
        crash; orbax raises StepAlreadyExistsError by default).

        block=False lets orbax persist to disk asynchronously so the train
        loop continues immediately (the caller passes HOST arrays via
        jax.device_get, so there is no donated-device-buffer hazard); any
        in-flight save is drained first, and close()/the next save
        synchronize before touching manager state."""
        self._mgr.wait_until_finished()  # drain a previous async save
        if epoch in self._mgr.all_steps():
            self._mgr.delete(epoch)
        self._mgr.save(epoch, args=ocp.args.StandardSave(state))
        if block:
            self._mgr.wait_until_finished()

    def latest_epoch(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_like: Any, epoch: int = -1) -> Any:
        """Restore into the structure of `state_like`.

        epoch=-1 -> latest (reference: tf.train.latest_checkpoint,
        train.py:84); else the given epoch (`--restore_epoch`, test.py:81-86).
        Returns None if nothing to restore.
        """
        self._mgr.wait_until_finished()  # a just-issued async save counts
        step = self.latest_epoch() if epoch < 0 else epoch
        if step is None or step not in self._mgr.all_steps():
            return None
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                          state_like)
        return self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))

    def all_epochs(self):
        return self._mgr.all_steps()

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()
