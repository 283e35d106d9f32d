"""Host→device prefetch: overlap batch transfer with device compute.

The reference overlaps host work with GPU compute through torch
``DataLoader`` worker processes + ``pin_memory`` + implicit CUDA-stream
async H2D (``utils/train_autopet.py:193-211``). The TPU-native analogue:
JAX dispatch is already asynchronous, so keeping a small deque of
batches *whose transfers have been initiated* ahead of the consumer lets
the (threaded) :class:`~veloxseg_tpu.data.dataset.PatchLoader` decode
and crop batch N+k on host CPU, and XLA DMA batch N+1 into HBM, while
the device executes step N. No extra threads are needed — ``device_put``
/ ``jnp.asarray`` return immediately with the copy in flight.
"""

from __future__ import annotations

import collections
from typing import Callable, Iterable, Iterator, Optional

import jax
import jax.numpy as jnp


def default_put(batch):
    """Transfer a (pytree of) host array(s) to the default device."""
    return jax.tree_util.tree_map(jnp.asarray, batch)


def prefetch_to_device(iterable: Iterable, size: int = 2,
                       put: Optional[Callable] = None) -> Iterator:
    """Yield batches from ``iterable`` with ``size`` transfers in flight.

    ``put`` maps a host batch to device array(s) — ``jnp.asarray`` by
    default; under SPMD pass a closure over
    :func:`~veloxseg_tpu.parallel.mesh.shard_host_batch` so each batch
    lands pre-sharded. ``size=2`` (double buffering) suffices to hide
    H2D latency behind a multi-ms step; larger values only pin more HBM.

    ``size <= 1`` degrades to plain eager transfer (no lookahead).
    """
    if put is None:
        put = default_put
    if size <= 1:
        for batch in iterable:
            yield put(batch)
        return
    buf = collections.deque()
    for batch in iterable:
        buf.append(put(batch))
        if len(buf) >= size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
