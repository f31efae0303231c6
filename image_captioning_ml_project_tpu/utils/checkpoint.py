"""Orbax checkpointing: model/optimizer/loss state + best-CIDEr policy.

The reference saves a single torch pickle with model/optimizer/scheduler
state, config, epoch, and best_val_score, keeping ``best_model`` separately
on val-CIDEr improvement (reference: src/train/trainer.py:569-620). Here the
same contract runs on Orbax (async-capable, TPU-native, sharding-aware):
``checkpoint_epoch_N`` trees plus a ``best`` alias, with a JSON sidecar for
config and scalar metadata.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp

from ..config import Config, config_to_dict

# Physical slots behind the logical rolling step checkpoint. ``save()``
# uses ``force=True`` which DELETES the target before the new commit; a
# crash inside that window with a single rolling name destroys both the
# old and the new save (observed live: a host kill mid-save left only
# epoch checkpoints). Alternating two slots means the previously
# committed save is never the deletion target.
STEP_SLOTS = ("checkpoint_step_0", "checkpoint_step_1")
# accepted on restore for checkpoints written before the two-slot scheme
_LEGACY_STEP = "checkpoint_step"


def _step_sort_key(directory: str, name: str):
    """Recency key for a committed step checkpoint: optimizer step if the
    sidecar recorded it, else (epoch, phase, batch) — both monotonic over
    a run. The sidecar alone does not prove a commit (it is written as
    soon as the save is staged); callers must check the tree dir."""
    meta_path = os.path.join(directory, name + ".meta.json")
    m = {}
    if os.path.exists(meta_path):
        try:
            with open(meta_path) as f:
                m = json.load(f).get("metadata", {})
        except (OSError, ValueError):
            m = {}
    return (m.get("step", -1), m.get("epoch", -1),
            1 if m.get("phase") == "scst" else 0, m.get("batch_index", -1))


def latest_step_checkpoint(directory: str) -> Optional[str]:
    """Name of the newest COMMITTED rolling step checkpoint in
    ``directory`` (two-slot scheme + the legacy single name), or None.
    Committed = the Orbax tree directory exists — Orbax renames the tmp
    dir into place atomically at commit, so a crash mid-save leaves no
    directory for the interrupted slot."""
    candidates = [n for n in STEP_SLOTS + (_LEGACY_STEP,)
                  if os.path.isdir(os.path.join(directory, n))]
    if not candidates:
        return None
    return max(candidates, key=lambda n: _step_sort_key(directory, n))


class CheckpointManager:
    """Minimal epoch-granular checkpoint store.

    With ``async_save=True``, ``save()`` returns once the state is staged to
    host memory; serialization + the atomic directory commit run on Orbax's
    background thread so the next epoch's compute overlaps the disk write
    (the reference's ``torch.save`` blocks the train loop). ``restore()``
    and ``exists()`` first drain any in-flight save, and callers should
    ``wait_until_finished()`` before process exit (the trainer does).
    """

    def __init__(self, directory: str, async_save: bool = False):
        self.directory = os.path.abspath(directory)
        self.async_save = async_save
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        """Names are keys within the checkpoint dir; anything spelled as a
        path (absolute or containing a separator) is used verbatim so
        ``--checkpoint runs/x/best_model`` does not silently resolve under
        ``checkpoint_dir``. Bare names always resolve under the directory —
        resolution must not depend on what happens to exist in the CWD
        (a leftover ./best_model would otherwise capture saves/restores)."""
        if os.path.isabs(name) or os.sep in name:
            return os.path.abspath(name)
        return os.path.join(self.directory, name)

    def save(self, name: str, state: Dict[str, Any],
             metadata: Optional[Dict[str, Any]] = None,
             config: Optional[Config] = None):
        """Save a pytree under ``name`` (overwrites), with JSON metadata."""
        path = self._path(name)
        state = jax.tree_util.tree_map(lambda x: x, state)  # shallow copy
        self._ckptr.save(path, state, force=True)
        if not self.async_save:
            self._ckptr.wait_until_finished()
        side = {"metadata": metadata or {}}
        if config is not None:
            side["config"] = config_to_dict(config)
        with open(path + ".meta.json", "w") as f:
            json.dump(side, f)

    def wait_until_finished(self):
        """Drain any in-flight async save (no-op for sync saves)."""
        self._ckptr.wait_until_finished()

    def save_step(self, state: Dict[str, Any],
                  metadata: Optional[Dict[str, Any]] = None,
                  config: Optional[Config] = None) -> str:
        """Rolling step checkpoint into the slot NOT holding the newest
        committed save, so a crash during this save (including the
        ``force=True`` delete of the target) can only lose a stale slot,
        never the latest durable state. Returns the slot written. The
        caller should drain in-flight saves first (the trainer does)."""
        newest = latest_step_checkpoint(self.directory)
        slot = STEP_SLOTS[1] if newest == STEP_SLOTS[0] else STEP_SLOTS[0]
        self.save(slot, state, metadata, config)
        return slot

    def _resolve(self, name: str) -> str:
        """The logical rolling name resolves to the newest committed slot
        when no literal (legacy) tree of that name exists."""
        if name == _LEGACY_STEP and not os.path.isdir(self._path(name)):
            latest = latest_step_checkpoint(self.directory)
            if latest is not None:
                return latest
        return name

    def restore(self, name: str, target: Optional[Dict[str, Any]] = None):
        """Restore a pytree; ``target`` provides structure/shardings."""
        self._ckptr.wait_until_finished()
        path = self._path(self._resolve(name))
        if target is not None:
            state = self._ckptr.restore(path, target)
        else:
            state = self._ckptr.restore(path)
        meta_path = path + ".meta.json"
        side = {}
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                side = json.load(f)
        return state, side.get("metadata", {}), side.get("config")

    def restore_partial(self, name: str, target: Dict[str, Any]):
        """Restore only the subtrees present in ``target`` from a full
        checkpoint tree (same on-disk format as :meth:`restore`).

        A serving hot swap needs the params (and batch_stats), not the
        optimizer state — which is ~2/3 of the bytes for Adam-family
        optimizers. On a tunnel-attached host this is the difference
        between a ~35 s and a ~11 s reload stall (measured, see
        docs/serving.md §Soak)."""
        self._ckptr.wait_until_finished()
        path = self._path(self._resolve(name))
        ckr = ocp.Checkpointer(ocp.PyTreeCheckpointHandler())
        try:
            state = ckr.restore(path, args=ocp.args.PyTreeRestore(
                item=target, partial_restore=True))
        finally:
            ckr.close()
        meta_path = path + ".meta.json"
        side = {}
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                side = json.load(f)
        return state, side.get("metadata", {}), side.get("config")

    def exists(self, name: str) -> bool:
        self._ckptr.wait_until_finished()
        return os.path.exists(self._path(self._resolve(name)))

    def save_epoch(self, epoch: int, state, metadata=None, config=None,
                   is_best: bool = False):
        """Epoch checkpoint + optional ``best`` alias
        (reference policy: src/train/trainer.py:190-198)."""
        self.save(f"checkpoint_epoch_{epoch + 1}", state, metadata, config)
        if is_best:
            self.save("best_model", state, metadata, config)
