"""Checkpointing: single-pytree msgpack checkpoints with rotation + resume.

Reference behavior being matched (not copied):
  * saveModel writes {model, [optimizer], train_cnt, epoch}
    (/root/reference/nerf/nerf_helper.py:7-15) across TWO files
    (<name>_mip.pt + <name>_prop.pt, optimizer state only in the mip file,
    train.py:257-258);
  * rotating window named chkpt_{(cnt % max_save) + 1}
    (/root/reference/ddp_train.py:287-290);
  * resume restores train_cnt/epoch counters
    (/root/reference/nerf/nerf_base.py:49-50, train.py:128-130).

TPU-native redesign: ONE file per checkpoint holding the whole train-state
pytree (params for all models + optimizer state + counters), serialized with
flax's msgpack codec. No `module.` DDP prefixes exist to strip — sharded
arrays are gathered by `jax.device_get` before writing. Atomic
write-then-rename so a preempted save never corrupts the resume point.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization


def _to_host(tree: Any) -> Any:
    """Device pytree -> host numpy pytree (gathers sharded arrays)."""
    return jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)), tree)


def save_checkpoint(path: str, tree: Any, step: int = 0, epoch: int = 0) -> str:
    """Write {state, step, epoch} to ``path`` atomically; returns the path."""
    # to_state_dict lowers NamedTuples (TrainState, optax states) to dicts
    payload = {"state": serialization.to_state_dict(_to_host(tree)),
               "step": int(step), "epoch": int(epoch)}
    data = serialization.msgpack_serialize(payload)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str, target: Optional[Any] = None):
    """Read a checkpoint; returns (state_pytree, step, epoch).

    With ``target`` given, the stored state is restored into the target's
    pytree structure (validating it); otherwise raw nested dicts are returned.
    """
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    state = payload["state"]
    if target is not None:
        state = serialization.from_state_dict(target, state)
    return state, int(payload["step"]), int(payload["epoch"])


class CheckpointManager:
    """Rotating checkpoint window with a resumable `latest` pointer.

    Keeps ``max_save`` slots named ``chkpt_{1..max_save}.ckpt`` (the
    reference's `chkpt_{(cnt % max_save)+1}` rotation, ddp_train.py:287-290)
    plus an `index.json` recording which slot is newest, so resume does not
    depend on filesystem mtimes.
    """

    def __init__(self, directory: str, max_save: int = 4, prefix: str = "chkpt"):
        self.directory = directory
        self.max_save = max(1, int(max_save))
        self.prefix = prefix
        self._count = 0
        os.makedirs(directory, exist_ok=True)
        idx = self._read_index()
        if idx is not None:
            self._count = int(idx.get("count", 0))

    def _index_path(self) -> str:
        return os.path.join(self.directory, f"{self.prefix}_index.json")

    def _read_index(self):
        try:
            with open(self._index_path()) as f:
                return json.load(f)
        except (OSError, ValueError):
            return None

    def slot_path(self, slot: int) -> str:
        return os.path.join(self.directory, f"{self.prefix}_{slot}.ckpt")

    def save(self, tree: Any, step: int = 0, epoch: int = 0) -> str:
        slot = (self._count % self.max_save) + 1
        path = save_checkpoint(self.slot_path(slot), tree, step, epoch)
        self._count += 1
        tmp = self._index_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"count": self._count, "latest_slot": slot,
                       "step": int(step), "epoch": int(epoch)}, f)
        os.replace(tmp, self._index_path())
        return path

    def latest_path(self) -> Optional[str]:
        idx = self._read_index()
        if idx is None:
            return None
        path = self.slot_path(int(idx["latest_slot"]))
        return path if os.path.exists(path) else None

    def restore(self, target: Optional[Any] = None):
        """(state, step, epoch) of the newest slot, or None if no checkpoint."""
        path = self.latest_path()
        if path is None:
            return None
        return load_checkpoint(path, target)
