"""Async (Orbax) checkpointing — preemption recovery on TPU.

SURVEY §5 commitment: the reference has only synchronous ``torch.save``
checkpoints (``utils/load_model.py:90-109``); on TPU, preemption-safe
training wants non-blocking saves so the train loop never stalls on
filesystem I/O. This module wraps ``orbax.checkpoint.AsyncCheckpointer``
around the same full-training-state payload and directory taxonomy as
:mod:`veloxseg_tpu.train.checkpoint` (``<epoch>`` / ``train_best`` /
``val_best`` under ``save/<dataset>/<model>/<date>[_index]/``,
``utils/train_autopet.py:281-331``) — an async save lands as an atomic
checkpoint *directory* instead of a msgpack file; both loaders in
``checkpoint.py`` accept either transparently.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Optional

from .checkpoint import build_payload


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())


class AsyncCheckpointWriter:
    """Non-blocking checkpoint writes with the reference taxonomy.

    ``save()`` snapshots state to host and returns immediately; the write
    happens on Orbax's background thread. ``wait()`` blocks until all
    pending writes are durable (call before touching/reading the files and
    at the end of training). One writer per training run.
    """

    def __init__(self) -> None:
        self._ckptr = _checkpointer()

    def save(self, path: str, params, opt_state=None, *,
             epoch: int = 0, best_train_dice: float = 0.0,
             best_val_dice: float = 0.0,
             scheduler_state: Optional[dict] = None) -> None:
        import orbax.checkpoint as ocp
        payload = build_payload(params, opt_state, epoch=epoch,
                                best_train_dice=best_train_dice,
                                best_val_dice=best_val_dice,
                                scheduler_state=scheduler_state)
        path = os.path.abspath(path)
        # Orbax refuses to overwrite without force; taxonomy names
        # (train_best/val_best) are rewritten repeatedly by design.
        self._ckptr.save(path, args=ocp.args.PyTreeSave(payload),
                         force=True)

    def wait(self) -> None:
        self._ckptr.wait_until_finished()

    def close(self) -> None:
        self._ckptr.close()

    def __enter__(self) -> "AsyncCheckpointWriter":
        return self

    def __exit__(self, *exc) -> None:
        self.wait()
        self.close()


def restore_payload(path: str) -> Dict[str, Any]:
    """Synchronous restore of an Orbax checkpoint directory into the same
    state-dict payload shape ``checkpoint.load_checkpoint`` expects."""
    import orbax.checkpoint as ocp
    with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
        payload = ckptr.restore(os.path.abspath(path))
    # Orbax restores scalars as 0-d numpy arrays; normalize metadata.
    for k in ("epoch", "best_train_dice", "best_val_dice"):
        if k in payload and hasattr(payload[k], "item"):
            payload[k] = payload[k].item()
    sched = payload.get("scheduler_state") or {}
    payload["scheduler_state"] = {
        k: (v.item() if hasattr(v, "item") else v)
        for k, v in sched.items()}
    return payload


def prune_checkpoint(path: str) -> None:
    """Remove a checkpoint (file or Orbax directory)."""
    if os.path.isdir(path):
        shutil.rmtree(path)
    elif os.path.exists(path):
        os.unlink(path)
