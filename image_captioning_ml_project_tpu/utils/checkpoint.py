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

    def restore(self, name: str, target: Optional[Dict[str, Any]] = None):
        """Restore a pytree; ``target`` provides structure/shardings."""
        self._ckptr.wait_until_finished()
        path = self._path(name)
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

    def exists(self, name: str) -> bool:
        self._ckptr.wait_until_finished()
        return os.path.exists(self._path(name))

    def save_epoch(self, epoch: int, state, metadata=None, config=None,
                   is_best: bool = False):
        """Epoch checkpoint + optional ``best`` alias
        (reference policy: src/train/trainer.py:190-198)."""
        self.save(f"checkpoint_epoch_{epoch + 1}", state, metadata, config)
        if is_best:
            self.save("best_model", state, metadata, config)
