"""Sliding-window whole-volume inference.

Behavior parity with MONAI ``sliding_window_inference`` as used by the
reference (``utils/inference_runtime.py:4-19``): overlap 0.25, **constant**
blending by default (the reference passes no ``mode``), optional gaussian
blending, symmetric zero-padding of volumes smaller than the ROI, and host
(CPU) accumulation for whole-body volumes that exceed device memory
(``utils/inference_petct.py:213-222``).

TPU-native shape: the tile grid is static; tiles are batched to
``sw_batch_size`` and run through one jitted predictor compiled once
(origins are traced scalars, so every tile batch reuses the same
executable); device accumulation is a second tiny jitted program using
``dynamic_update_slice``-add. No per-tile recompilation, no host↔device
ping-pong unless ``cpu_accumulate`` is requested.
"""

from __future__ import annotations

import functools
import math
from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def compute_tile_origins(image_size: Sequence[int], roi_size: Sequence[int],
                         overlap: float) -> List[Tuple[int, ...]]:
    """Static tile-origin grid (MONAI dense_patch_slices parity).

    Per axis: scan interval = round(roi · (1−overlap)); starts are
    ``i·interval`` clamped so the last tile ends exactly at the volume edge.
    """
    ndim = len(image_size)
    per_axis: List[List[int]] = []
    for d in range(ndim):
        size, roi = int(image_size[d]), int(roi_size[d])
        if size <= roi:
            per_axis.append([0])
            continue
        interval = int(roi * (1.0 - overlap)) or 1
        n = int(math.ceil((size - roi) / interval)) + 1
        starts = [min(i * interval, size - roi) for i in range(n)]
        dedup = sorted(set(starts))
        per_axis.append(dedup)
    origins: List[Tuple[int, ...]] = [()]
    for axis_starts in per_axis:
        origins = [o + (s,) for o in origins for s in axis_starts]
    return origins


def _gaussian_importance(roi_size: Sequence[int],
                         sigma_scale: float = 0.125) -> np.ndarray:
    """Separable gaussian importance map (MONAI GaussianFilter parity)."""
    maps = []
    for r in roi_size:
        center = (r - 1) / 2.0
        sigma = max(r * sigma_scale, 1e-3)
        x = np.arange(r, dtype=np.float64)
        maps.append(np.exp(-0.5 * ((x - center) / sigma) ** 2))
    g = functools_reduce_outer(maps)
    g = np.clip(g, np.max(g) * 1e-3, None)
    return g.astype(np.float32)


def functools_reduce_outer(axes_maps: List[np.ndarray]) -> np.ndarray:
    out = axes_maps[0]
    for m in axes_maps[1:]:
        out = np.multiply.outer(out, m)
    return out


# Per-call caches: tracing the predictor with ``jax.eval_shape`` to learn
# its output channel count costs ~100 ms of pure Python per volume (the
# full flax model is retraced), and re-uploading the importance map is a
# fresh H2D transfer. Both depend only on static keys, so memoize them.
# Keys hold predictor references exactly like the lru_cache below does,
# and the cache is bounded (FIFO) so per-volume lambdas (which defeat
# caching anyway) cannot pin an unbounded set of closures + params.
_CACHE_MAX = 16
_OUT_CHANNELS_CACHE: dict = {}
_IMPORTANCE_CACHE: dict = {}


def _probe_out_channels(predictor, params, tiles_shape) -> int:
    key = (predictor, params is not None, tiles_shape.shape,
           tiles_shape.dtype)
    k = _OUT_CHANNELS_CACHE.get(key)
    if k is None:
        if params is not None:
            k = jax.eval_shape(predictor, params, tiles_shape).shape[-1]
        else:
            k = jax.eval_shape(predictor, tiles_shape).shape[-1]
        while len(_OUT_CHANNELS_CACHE) >= _CACHE_MAX:
            _OUT_CHANNELS_CACHE.pop(next(iter(_OUT_CHANNELS_CACHE)))
        _OUT_CHANNELS_CACHE[key] = int(k)
    return int(k)


def _importance_device(mode: str, roi: Tuple[int, ...],
                       importance: np.ndarray) -> jnp.ndarray:
    key = (mode, roi)
    imp = _IMPORTANCE_CACHE.get(key)
    if imp is None:
        imp = jnp.asarray(importance)[None, ..., None]
        _IMPORTANCE_CACHE[key] = imp
    return imp


@functools.lru_cache(maxsize=16)
def _volume_runner(predictor, roi: Tuple[int, ...], sw_batch_size: int,
                   b: int, c: int, k: int, padded_spatial: Tuple[int, ...],
                   overlap: float, mesh=None):
    """One jitted XLA program for a whole volume: ``lax.scan`` over tile
    batches, each doing extract → predict → blend-accumulate on device.

    A single dispatch per volume — the per-batch Python loop costs ~4 host
    round-trips per tile batch, which on a tunneled TPU (30 ms latency)
    makes dispatch, not compute, the bottleneck. Params and the importance
    map are explicit arguments so nothing large is inlined into the HLO as
    a constant (multi-MB constants stall remote compiles).

    With a ``mesh`` the tile batch is sharded over the ``data`` axis
    (tiles are independent — pure data parallelism; XLA all-gathers the
    logits before the blend scan, which is bandwidth-trivial next to the
    model forward). The volume and accumulators stay replicated.

    Cached on (predictor, shape signature): drivers build their predictor
    once per model, so repeat volumes of the same shape reuse the
    executable.
    """
    origins = compute_tile_origins(padded_spatial, roi, overlap)
    n_real = len(origins)
    n_pad = (-n_real) % sw_batch_size
    all_origins = origins + [origins[0]] * n_pad
    nb = len(all_origins) // sw_batch_size
    ndim = len(roi)
    org = np.asarray(all_origins, np.int32).reshape(
        nb, sw_batch_size, ndim)
    val = (np.arange(len(all_origins)) < n_real).astype(
        np.float32).reshape(nb, sw_batch_size)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        tile_sharding = NamedSharding(mesh, P("data"))
        replicated = NamedSharding(mesh, P())

    def run(params, inputs, imp):
        out_sum = jnp.zeros((b, *padded_spatial, k), jnp.float32)
        cnt = jnp.zeros((1, *padded_spatial, 1), jnp.float32)

        def extract(origin):
            start = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32), origin,
                 jnp.zeros((1,), jnp.int32)])
            return jax.lax.dynamic_slice(
                inputs, start, (b, *roi, inputs.shape[-1]))

        def tile_body(carry, xs):
            acc, cn = carry
            tile, origin, v = xs
            start = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32), origin,
                 jnp.zeros((1,), jnp.int32)])
            w = imp * v
            cur = jax.lax.dynamic_slice(acc, start, (b, *roi, k))
            acc = jax.lax.dynamic_update_slice(acc, cur + tile * w, start)
            cur_c = jax.lax.dynamic_slice(cn, start, (1, *roi, 1))
            cn = jax.lax.dynamic_update_slice(cn, cur_c + w, start)
            return (acc, cn), None

        def batch_body(carry, xs):
            ob, vb = xs
            tiles = jax.vmap(extract)(ob).reshape(
                (-1, *roi, inputs.shape[-1]))
            if mesh is not None:
                tiles = jax.lax.with_sharding_constraint(
                    tiles, tile_sharding)
            logits = predictor(params, tiles).astype(jnp.float32)
            if mesh is not None:
                logits = jax.lax.with_sharding_constraint(
                    logits, replicated)
            logits = logits.reshape((sw_batch_size, b, *roi, k))
            return jax.lax.scan(tile_body, carry, (logits, ob, vb))[0], None

        (out_sum, cnt), _ = jax.lax.scan(
            batch_body, (out_sum, cnt),
            (jnp.asarray(org), jnp.asarray(val)))
        return out_sum / cnt

    return jax.jit(run)


def sliding_window_inference(
    inputs: jnp.ndarray,
    roi_size: Sequence[int],
    sw_batch_size: int,
    predictor: Callable[..., jnp.ndarray],
    overlap: float = 0.25,
    mode: str = "constant",
    cpu_accumulate: bool = False,
    params=None,
    mesh=None,
) -> jnp.ndarray:
    """Tile, predict, blend.

    Args:
      inputs: (B, D, H, W, C) volume (channels-last).
      roi_size: patch size (D, H, W).
      predictor: jittable fn (n, *roi, C) -> (n, *roi, K) logits — or,
        when ``params`` is given, ``(params, tiles) -> logits``.
      mode: 'constant' (reference default) or 'gaussian' blending.
      cpu_accumulate: accumulate sums on host (for whole-body volumes).
      params: optional model params pytree. When set (and not
        ``cpu_accumulate``) the whole volume runs as ONE jitted program —
        tile extraction, model forward and blending inside a ``lax.scan``
        — instead of a host loop of per-batch dispatches.
      mesh: optional ``jax.sharding.Mesh`` with a ``data`` axis. Shards
        the tile batch over ``data`` in the one-program path (the
        forward is data-parallel over tiles; blending stays replicated).
        ``sw_batch_size`` is rounded up so tiles divide the axis. Use
        ``data=N`` meshes for inference — a ``spatial`` axis merely
        replicates tile compute. Ignored with ``cpu_accumulate``.

    Returns (B, D, H, W, K) blended logits.

    Note: the probe/compile caches key on the *identity* of ``predictor``.
    Pass the same callable across volumes (hoist it out of the loop); a
    fresh lambda per volume gets zero cache hits and a recompile each
    time in the one-program path.
    """
    b, *spatial, c = inputs.shape
    roi = [int(r) for r in roi_size]
    if mesh is not None and params is not None and not cpu_accumulate:
        # Tile batch (sw_batch_size·b) must divide the data axis evenly;
        # rounding sw_batch_size to a multiple of the axis guarantees it.
        n_data = mesh.shape["data"]
        if (sw_batch_size * b) % n_data:
            sw_batch_size = -(-sw_batch_size // n_data) * n_data
    else:
        mesh = None

    # Pad volumes smaller than the ROI (symmetric, zeros — MONAI parity).
    pads = []
    for s, r in zip(spatial, roi):
        extra = max(r - s, 0)
        pads.append((extra // 2, extra - extra // 2))
    if any(p != (0, 0) for p in pads):
        inputs = jnp.pad(inputs, [(0, 0)] + pads + [(0, 0)])
    padded_spatial = inputs.shape[1:-1]

    if mode == "constant":
        importance = np.ones(roi, dtype=np.float32)
    elif mode == "gaussian":
        importance = _gaussian_importance(roi)
    else:
        raise ValueError(f"unknown blend mode {mode!r}")

    # Probe output channels without running the predictor (cached — the
    # eval_shape trace of a full model costs ~100 ms Python per call).
    tiles_shape = jax.ShapeDtypeStruct(
        (sw_batch_size * b, *roi, inputs.shape[-1]), inputs.dtype)
    k = _probe_out_channels(predictor, params, tiles_shape)
    imp = _importance_device(mode, tuple(roi), importance)

    if params is not None and not cpu_accumulate:
        run = _volume_runner(predictor, tuple(roi), sw_batch_size, b, c,
                             int(k), tuple(padded_spatial), overlap,
                             mesh=mesh)
        if mesh is not None:
            # Trace under the mesh scope so PWA attention keeps its fused
            # Pallas kernel on via shard_map (nn/pwa.py:240-256).
            from ..ops import pwa_attention
            with pwa_attention.spmd_scope(mesh):
                blended = run(params, inputs, imp)
        else:
            blended = run(params, inputs, imp)
        if any(p != (0, 0) for p in pads):
            slices = tuple(slice(p[0], p[0] + s)
                           for p, s in zip(pads, spatial))
            blended = blended[(slice(None),) + slices + (slice(None),)]
        return blended

    if params is not None:
        pred_jit = jax.jit(predictor)
        predictor = lambda t: pred_jit(params, t)  # noqa: E731
    else:
        predictor = jax.jit(predictor)  # predictor is jittable by contract

    origins = compute_tile_origins(padded_spatial, roi, overlap)

    # Pad the origin list to a multiple of sw_batch_size so every predictor
    # call sees the same static tile-batch shape — one compile total, no
    # ragged-tail recompile. Padded slots reuse origin 0 and carry weight 0
    # in the accumulation.
    n_real = len(origins)
    n_pad = (-n_real) % sw_batch_size
    all_origins = origins + [origins[0]] * n_pad

    @jax.jit
    def extract_batch(vol, origin_batch):
        def one(origin):
            start = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32), origin,
                 jnp.zeros((1,), jnp.int32)])
            return jax.lax.dynamic_slice(
                vol, start, (vol.shape[0], *roi, vol.shape[-1]))
        tiles = jax.vmap(one)(origin_batch)  # (n, b, *roi, c)
        return tiles.reshape((-1, *roi, vol.shape[-1]))

    if cpu_accumulate:
        out_sum = np.zeros((b, *padded_spatial, k), dtype=np.float32)
        cnt = np.zeros((1, *padded_spatial, 1), dtype=np.float32)
    else:
        out_sum = jnp.zeros((b, *padded_spatial, k), dtype=jnp.float32)
        cnt = jnp.zeros((1, *padded_spatial, 1), dtype=jnp.float32)

        # NB: the importance map is an explicit argument, never a closure
        # capture — a captured array would be inlined into the jitted HLO
        # as a multi-MB constant (slow remote compiles on tunneled TPUs).
        # Donating the accumulators keeps the updates in-place.
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def accumulate_batch(out_sum, cnt, logits, origin_batch, valid,
                             imp_arg):
            tiles = logits.reshape((sw_batch_size, b, *roi, k))

            def body(carry, xs):
                acc, c = carry
                tile, origin, v = xs
                start = jnp.concatenate(
                    [jnp.zeros((1,), jnp.int32), origin,
                     jnp.zeros((1,), jnp.int32)])
                w = imp_arg * v
                cur = jax.lax.dynamic_slice(acc, start, (b, *roi, k))
                acc = jax.lax.dynamic_update_slice(
                    acc, cur + tile * w, start)
                cur_c = jax.lax.dynamic_slice(c, start, (1, *roi, 1))
                c = jax.lax.dynamic_update_slice(c, cur_c + w, start)
                return (acc, c), None

            (out_sum, cnt), _ = jax.lax.scan(
                body, (out_sum, cnt), (tiles, origin_batch, valid))
            return out_sum, cnt

    np_imp = importance[None, ..., None]
    for idx in range(0, len(all_origins), sw_batch_size):
        batch_origins = all_origins[idx:idx + sw_batch_size]
        ob = jnp.asarray(batch_origins, jnp.int32)
        logits = predictor(extract_batch(inputs, ob)).astype(jnp.float32)
        if cpu_accumulate:
            logits_np = np.asarray(logits)
            for j, o in enumerate(batch_origins):
                if idx + j >= n_real:
                    break
                sl = (slice(None),) + tuple(
                    slice(s, s + r) for s, r in zip(o, roi)) + (
                    slice(None),)
                out_sum[sl] += logits_np[j * b:(j + 1) * b] * np_imp
                cnt[sl[:1] + sl[1:-1] + (slice(None),)] += np_imp
        else:
            valid = jnp.asarray(
                (np.arange(idx, idx + sw_batch_size) < n_real)
                .astype(np.float32))
            out_sum, cnt = accumulate_batch(out_sum, cnt, logits, ob,
                                            valid, imp)

    if cpu_accumulate:
        blended = jnp.asarray(out_sum / cnt)
    else:
        blended = out_sum / cnt

    # Crop padding back off.
    if any(p != (0, 0) for p in pads):
        slices = tuple(slice(p[0], p[0] + s)
                       for p, s in zip(pads, spatial))
        blended = blended[(slice(None),) + slices + (slice(None),)]
    return blended
