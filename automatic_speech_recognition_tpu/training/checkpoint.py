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

import glob
import logging
import os
import shutil
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

# orbax emits copious INFO logs per save/restore (through both the std
# `orbax` loggers and absl); keep driver logs readable — but never
# override a level the user has configured explicitly.
for _name in ("orbax", "orbax.checkpoint", "absl"):
    _lg = logging.getLogger(_name)
    if _lg.level == logging.NOTSET:
        _lg.setLevel(logging.WARNING)

_BAK_SUFFIX = ".replaced"


def _primary() -> bool:
    return jax.process_index() == 0


def _sync(tag: str) -> None:
    """Global barrier in multi-host runs; no-op single-process.  The
    backup-rename/rollback surgery below mutates the shared checkpoint
    directory, so exactly one process performs it and every other waits
    here before re-scanning (orbax's own save/restore entry points are
    ALSO global collectives — which is why CheckpointManager methods must
    be called from ALL processes, never gated to one)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(f"arsh_ckpt_{tag}")


class CheckpointManager:
    """Epoch-indexed TrainState checkpoints (reference: `las_E{epoch}`).

    Multi-host: construct and call on EVERY process — orbax coordinates
    the single writer internally and its save/restore contain global
    barriers; the directory surgery this class adds (overwrite backups,
    crash rollback) is primary-only between explicit barriers."""

    def __init__(self, directory: str, max_to_keep: int = 30):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self._dir = directory
        self._mgr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def _drop_backups(self) -> None:
        """Remove committed-over backups.  Only called right after a
        wait_until_finished(), i.e. when every issued save has durably
        committed, so the backups are no longer the last good copy."""
        if not _primary():
            return
        for p in glob.glob(os.path.join(self._dir, "*" + _BAK_SUFFIX)):
            shutil.rmtree(p, ignore_errors=True)

    def save(self, epoch: int, state: Any, block: bool = True) -> None:
        """Save, overwriting an existing checkpoint for the same epoch
        (tf.train.Saver semantics: resuming and re-saving epoch N must not
        crash; orbax raises StepAlreadyExistsError by default).

        Overwrite is write-then-discard, not delete-then-write: the old
        epoch directory is renamed aside first and only removed after a
        later save/close confirms the replacement committed, so a crash
        mid-save cannot lose both copies (restore() falls back to the
        renamed one).

        block=False lets orbax persist to disk asynchronously so the train
        loop continues immediately (the caller passes HOST arrays via
        jax.device_get, so there is no donated-device-buffer hazard); any
        in-flight save is drained first, and close()/the next save
        synchronize before touching manager state."""
        self._mgr.wait_until_finished()  # drain a previous async save
        self._drop_backups()             # previous overwrites committed
        if epoch in self._mgr.all_steps():
            if _primary():
                bak = os.path.join(self._dir, f"{epoch}{_BAK_SUFFIX}")
                shutil.rmtree(bak, ignore_errors=True)
                os.rename(os.path.join(self._dir, str(epoch)), bak)
            _sync(f"overwrite_{epoch}")
            self._mgr.reload()  # re-scan: the step dir moved underneath
        self._mgr.save(epoch, args=ocp.args.StandardSave(state))
        if block:
            self._mgr.wait_until_finished()
            self._drop_backups()

    def latest_epoch(self) -> Optional[int]:
        return self._mgr.latest_step()

    def _resolve_step(self, epoch: int) -> Optional[int]:
        """Drain async saves, roll back interrupted overwrites, and map
        epoch (-1 = latest) to a committed step, or None."""
        self._mgr.wait_until_finished()  # a just-issued async save counts
        # Roll back interrupted overwrites: a backup whose step is absent
        # from the committed set means the replacement never landed.
        # Primary-only surgery: concurrent renames from several processes
        # would race (the loser's rename raises or clobbers fresh state).
        rolled_back = False
        if _primary():
            for p in glob.glob(os.path.join(self._dir, "*" + _BAK_SUFFIX)):
                s = os.path.basename(p)[: -len(_BAK_SUFFIX)]
                if s.isdigit() and int(s) not in self._mgr.all_steps():
                    os.rename(p, os.path.join(self._dir, s))
                    rolled_back = True
        if jax.process_count() > 1:
            # unconditional: a non-primary cannot know whether primary is
            # mid-rename, so everyone meets here then re-scans
            _sync("rollback")
            self._mgr.reload()
        elif rolled_back:
            self._mgr.reload()
        step = self.latest_epoch() if epoch < 0 else epoch
        if step is None or step not in self._mgr.all_steps():
            return None
        return step

    def restore(self, state_like: Any, epoch: int = -1) -> Any:
        """Restore into the structure of `state_like`.

        epoch=-1 -> latest (reference: tf.train.latest_checkpoint,
        train.py:84); else the given epoch (`--restore_epoch`, test.py:81-86).
        Returns None if nothing to restore.  If an overwrite crashed
        between renaming the old epoch aside and committing the new one,
        the renamed backup is restored into place first.
        """
        step = self._resolve_step(epoch)
        if step is None:
            return None
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                          state_like)
        return self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))

    def restore_for_eval(self, state_like: Any, epoch: int = -1) -> Any:
        """Weights-only restore for eval/decode/serving callers.

        Copies every checkpointed field except optimizer state and RNG
        into `state_like`, reading the on-disk tree structurally, so a
        checkpoint trained with a different optimizer wrapping (e.g.
        --grad_accum_steps N wraps opt_state in optax.MultiSteps) still
        loads.  Eval graphs never touch opt_state — the reference's eval
        var list likewise only intersects weights (las/utils.py:69-82).
        """
        step = self._resolve_step(epoch)
        if step is None:
            return None
        raw = self._mgr.restore(step)  # structure read from disk
        keep = {k: v for k, v in raw.items()
                if k in state_like._fields and k not in ("opt_state", "rng")}
        return state_like._replace(**keep)

    def all_epochs(self):
        return self._mgr.all_steps()

    def close(self):
        self._mgr.wait_until_finished()
        self._drop_backups()
        self._mgr.close()
