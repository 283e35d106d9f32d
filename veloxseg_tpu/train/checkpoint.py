"""Checkpoint save / resume.

Taxonomy parity with the reference (``utils/load_model.py:90-147``,
``utils/train_autopet.py:281-331``): a single file per checkpoint holding
{params, opt_state, scheduler state, epoch, best_train_dice,
best_val_dice}; files named ``<epoch>.ckpt`` every save interval plus
``train_best.ckpt`` / ``val_best.ckpt`` under
``save/<dataset>/<model>/<date>[_index]/``.

Serialization is flax msgpack (single file, atomic rename) — the
functional analogue of a torch ``.pth`` state dict. Inference loading
accepts either a full training checkpoint or a bare params tree
(``utils/inference_petct.py:95-101`` parity).
"""

from __future__ import annotations

import os
import tempfile
from typing import Any, Dict, Optional

import jax
from flax import serialization


def build_payload(params, opt_state=None, *, epoch: int = 0,
                  best_train_dice: float = 0.0,
                  best_val_dice: float = 0.0,
                  scheduler_state: Optional[dict] = None) -> Dict[str, Any]:
    """Full-training-state payload (reference ``save_checkpoint`` dict
    contract, ``utils/load_model.py:90-109``)."""
    return {
        # to_state_dict flattens optax namedtuple states to plain dicts —
        # msgpack can't encode custom pytree nodes directly.
        "params": serialization.to_state_dict(jax.device_get(params)),
        "opt_state": serialization.to_state_dict(
            jax.device_get(opt_state)) if opt_state is not None else None,
        "epoch": epoch,
        "best_train_dice": float(best_train_dice),
        "best_val_dice": float(best_val_dice),
        "scheduler_state": scheduler_state or {},
    }


def save_checkpoint(path: str, params, opt_state=None, *,
                    epoch: int = 0, best_train_dice: float = 0.0,
                    best_val_dice: float = 0.0,
                    scheduler_state: Optional[dict] = None) -> None:
    payload = build_payload(params, opt_state, epoch=epoch,
                            best_train_dice=best_train_dice,
                            best_val_dice=best_val_dice,
                            scheduler_state=scheduler_state)
    data = serialization.msgpack_serialize(payload)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".",
                               suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def _jnp_leaves(tree):
    """msgpack_restore yields numpy leaves; convert to device arrays so
    restored params behave identically to freshly-initialized ones (numpy
    leaves inside jit traces both re-upload every call and break
    numpy-side indexing)."""
    import jax.numpy as jnp
    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if hasattr(x, "shape") else x, tree)


def load_checkpoint(path: str, params_template=None,
                    opt_state_template=None) -> Dict[str, Any]:
    """Load a checkpoint; templates restore exact dtypes/structure.

    Accepts both msgpack files and Orbax checkpoint directories (the
    async-save format, :mod:`veloxseg_tpu.train.orbax_ckpt`).
    """
    if os.path.isdir(path):
        from .orbax_ckpt import restore_payload
        payload = restore_payload(path)
    else:
        with open(path, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
    if params_template is not None and payload.get("params") is not None:
        payload["params"] = serialization.from_state_dict(
            params_template, payload["params"])
    if (opt_state_template is not None
            and payload.get("opt_state") is not None):
        payload["opt_state"] = serialization.from_state_dict(
            opt_state_template, payload["opt_state"])
    payload["params"] = _jnp_leaves(payload.get("params"))
    if payload.get("opt_state") is not None:
        payload["opt_state"] = _jnp_leaves(payload["opt_state"])
    return payload


def load_params(path: str, params_template=None):
    """Load params only — accepts full checkpoints or bare param trees.

    ``.pth`` files are reference PyTorch checkpoints (wrapped or bare state
    dicts, ``utils/inference_petct.py:95-101``) and are mapped onto the
    flax tree via :mod:`veloxseg_tpu.interop.torch_import` — so a
    reference-trained VeloxSeg model evaluates here unchanged.
    """
    if path.endswith(".pth"):
        from ..interop.torch_import import import_torch_checkpoint
        return _jnp_leaves(import_torch_checkpoint(path, params_template))
    if os.path.isdir(path):
        from .orbax_ckpt import restore_payload
        payload = restore_payload(path)
    else:
        with open(path, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
    params = payload.get("params", payload) if isinstance(payload, dict) \
        else payload
    if params_template is not None:
        params = serialization.from_state_dict(params_template, params)
    return _jnp_leaves(params)
