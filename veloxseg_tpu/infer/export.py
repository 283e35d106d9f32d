"""Serving export: the eval forward as a portable StableHLO artifact.

The reference has no deployment layer — serving it means shipping the
whole framework plus a torch ``.pth`` and re-running ``load_model``
(``/root/reference/utils/load_model.py:3-88``). Here the eval-mode
forward is exported with :mod:`jax.export` into a single self-contained
artifact:

- **StableHLO** program bytes (version-stable serialization), callable
  from any later JAX process — or from C++ serving stacks via the PJRT
  C API — *without the model code*;
- the **batch dimension is symbolic**, so one artifact serves any batch
  size (shape-polymorphic export);
- lowered for one or more platforms (``tpu``/``cpu``) in the same
  artifact;
- parameters stay *arguments* (not baked constants), so the artifact
  pairs with ordinary checkpoints and weight updates don't require
  re-export. :func:`save_artifact` bundles serialized params next to the
  program in one msgpack file for convenience.

Export always runs under :func:`..ops.pwa_attention.portable_scope` —
the artifact is pure StableHLO (no Mosaic custom calls), so it is not
pinned to a libtpu version; XLA re-fuses the attention chain when the
destination compiles it.
"""

from __future__ import annotations

import os
import tempfile
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import serialization

from ..ops import pwa_attention

_PAYLOAD_VERSION = 1


def export_eval(model, params, input_size: Sequence[int], channels: int,
                *, platforms: Optional[Sequence[str]] = None,
                batch: Optional[int] = None,
                dtype=jnp.float32) -> "jax.export.Exported":
    """Export ``model.apply(..., train=False)`` as shape-polymorphic
    StableHLO.

    ``batch=None`` exports a symbolic batch dimension (any batch size at
    call time); an int pins it. ``platforms`` defaults to the current
    backend; pass e.g. ``("tpu", "cpu")`` for a multi-platform artifact.
    """
    def fwd(p, x):
        return model.apply({"params": p}, x, train=False)

    if batch is None:
        (b,) = jax.export.symbolic_shape("b")
    else:
        b = int(batch)
    x_spec = jax.ShapeDtypeStruct((b, *tuple(input_size), channels), dtype)
    p_specs = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params)
    kwargs: Dict[str, Any] = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    with pwa_attention.portable_scope():
        return jax.export.export(jax.jit(fwd), **kwargs)(p_specs, x_spec)


def save_artifact(path: str, exported: "jax.export.Exported",
                  params=None, *, metadata: Optional[Dict] = None) -> None:
    """Bundle {StableHLO bytes, optional params, metadata} in one msgpack
    file (atomic rename, like train/checkpoint.py)."""
    payload = {
        "version": _PAYLOAD_VERSION,
        "stablehlo": exported.serialize(),
        "params": serialization.to_state_dict(jax.device_get(params))
        if params is not None else None,
        "metadata": dict(metadata or {}),
    }
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


def load_artifact(path: str) -> Tuple["jax.export.Exported",
                                      Optional[Dict], Dict]:
    """Load an artifact → (exported_fn, params_or_None, metadata).

    ``exported_fn.call(params, x)`` runs the program (jit-compilable,
    differentiable-through if the destination wants it)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    if payload.get("version") != _PAYLOAD_VERSION:
        raise ValueError(
            f"unsupported artifact version {payload.get('version')!r}")
    exported = jax.export.deserialize(bytearray(payload["stablehlo"]))
    params = payload.get("params")
    if params is not None:
        params = jax.tree_util.tree_map(jnp.asarray, params)
    return exported, params, dict(payload.get("metadata") or {})
