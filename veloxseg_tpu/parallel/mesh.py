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


def stacked_batch_sharding(mesh: Mesh, spatial_shard: bool = True
                           ) -> NamedSharding:
    """Sharding for a (K, B, D, H, W, C) multi-step batch stack: the
    scan axis K is replicated; B/D shard like :func:`batch_sharding`."""
    if spatial_shard:
        return NamedSharding(mesh, P(None, "data", "spatial"))
    return NamedSharding(mesh, P(None, "data"))


def stacked_label_sharding(mesh: Mesh, spatial_shard: bool = True
                           ) -> NamedSharding:
    """Sharding for (K, B, D, H, W) stacked integer labels."""
    if spatial_shard:
        return NamedSharding(mesh, P(None, "data", "spatial"))
    return NamedSharding(mesh, P(None, "data"))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def parse_mesh_spec(spec: Optional[str]) -> Optional[Mesh]:
    """Build a mesh from a CLI spec.

    ``None``/empty → no mesh (single-device step). ``"auto"`` → all local
    devices, factored (data × spatial). ``"data=4"`` / ``"data=4,spatial=2"``
    → explicit axis sizes (uses the first data·spatial devices).
    """
    if not spec:
        return None
    if spec == "auto":
        return make_mesh()
    kw = {}
    for part in spec.split(","):
        k, _, v = part.partition("=")
        if k.strip() not in ("data", "spatial") or not v:
            raise ValueError(
                f"bad --mesh spec {spec!r}; expected 'auto' or "
                f"'data=N[,spatial=M]'")
        kw[k.strip()] = int(v)
    data = kw.get("data")
    spatial = kw.get("spatial", 1)
    if data is None:
        data = jax.device_count() // spatial
    n = data * spatial
    if n > jax.device_count():
        raise ValueError(f"--mesh {spec!r} needs {n} devices, have "
                         f"{jax.device_count()}")
    return make_mesh(jax.devices()[:n], data=data, spatial=spatial)


def shard_host_batch(x, sharding: NamedSharding):
    """Place a host batch onto the mesh.

    Multi-process (SURVEY §5 comm-backend plan): ``x`` is the full
    GLOBAL batch — every process builds the identical batch (same files,
    seed, loader order; see ``parallel/distributed.py``) and each
    addressable device fetches exactly its shard via
    ``jax.make_array_from_callback``, which is correct for any mesh
    layout (incl. spatial sharding splitting a batch row across hosts).
    Single-process (incl. virtual CPU meshes): a plain device_put, which
    XLA splits across the addressable devices.
    """
    x = np.asarray(x)
    if jax.process_count() > 1:
        return jax.make_array_from_callback(x.shape, sharding,
                                            lambda idx: x[idx])
    return jax.device_put(x, sharding)
