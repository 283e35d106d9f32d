"""Device mesh and sharding helpers.

The reference is single-process single-GPU (SURVEY §2.5); scaling here is
TPU-native from the start: a 2-D ``(data, spatial)`` mesh. Batch shards
over ``data`` (pure data parallelism — XLA inserts the gradient
all-reduce), and the leading spatial axis optionally shards over
``spatial`` (sequence/spatial parallelism for large volumes — GSPMD
inserts halo exchanges for the convolutions automatically). Parameters are
replicated; at 1.66 M params there is nothing to gain from sharding them
(SURVEY §2.5 table).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _factor(n: int) -> Tuple[int, int]:
    """Split n into (data, spatial) with spatial ∈ {1, 2} preferring data."""
    if n % 2 == 0 and n > 2:
        return n // 2, 2
    return n, 1


def make_mesh(devices: Optional[Sequence] = None,
              data: Optional[int] = None,
              spatial: Optional[int] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None or spatial is None:
        data, spatial = _factor(n)
    if data * spatial != n:
        raise ValueError(f"mesh {data}x{spatial} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, spatial)
    return Mesh(dev_array, axis_names=("data", "spatial"))


def batch_sharding(mesh: Mesh, spatial_shard: bool = True) -> NamedSharding:
    """Sharding for a (B, D, H, W, C) batch."""
    if spatial_shard:
        return NamedSharding(mesh, P("data", "spatial"))
    return NamedSharding(mesh, P("data"))


def label_sharding(mesh: Mesh, spatial_shard: bool = True) -> NamedSharding:
    """Sharding for (B, D, H, W) integer labels."""
    if spatial_shard:
        return NamedSharding(mesh, P("data", "spatial"))
    return NamedSharding(mesh, P("data"))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
