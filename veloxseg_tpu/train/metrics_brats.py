"""BraTS region metrics (ET / TC / WT dice).

Parity: reference ``utils/metric/metrics_brats.py:21-46`` — region masks
ET=(label==3), TC=(label∈{1,3}), WT=(label≠0); per-sample dice with eps
1e-6 then batch mean.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

_EPS = 1e-6


def _region_dice(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    axes = tuple(range(1, pred.ndim))
    inter = jnp.sum(pred * target, axis=axes) + _EPS
    union = jnp.sum(pred, axis=axes) + jnp.sum(target, axis=axes) + 2 * _EPS
    return jnp.mean(2.0 * inter / union)


def brats_dice(pred: jnp.ndarray, target: jnp.ndarray
               ) -> Dict[str, jnp.ndarray]:
    """pred/target are int label maps (B, *spatial) with classes {0,1,2,3}."""
    et = _region_dice((pred == 3).astype(jnp.float32),
                      (target == 3).astype(jnp.float32))
    tc = _region_dice(((pred == 1) | (pred == 3)).astype(jnp.float32),
                      ((target == 1) | (target == 3)).astype(jnp.float32))
    wt = _region_dice((pred != 0).astype(jnp.float32),
                      (target != 0).astype(jnp.float32))
    return {"avg": (et + tc + wt) / 3.0, "et": et, "tc": tc, "wt": wt}
