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


def sliding_window_inference(
    inputs: jnp.ndarray,
    roi_size: Sequence[int],
    sw_batch_size: int,
    predictor: Callable[[jnp.ndarray], jnp.ndarray],
    overlap: float = 0.25,
    mode: str = "constant",
    cpu_accumulate: bool = False,
) -> jnp.ndarray:
    """Tile, predict, blend.

    Args:
      inputs: (B, D, H, W, C) volume (channels-last).
      roi_size: patch size (D, H, W).
      predictor: jittable fn (n, *roi, C) -> (n, *roi, K) logits.
      mode: 'constant' (reference default) or 'gaussian' blending.
      cpu_accumulate: accumulate sums on host (for whole-body volumes).

    Returns (B, D, H, W, K) blended logits.
    """
    b, *spatial, c = inputs.shape
    ndim = len(spatial)
    roi = [int(r) for r in roi_size]

    # Pad volumes smaller than the ROI (symmetric, zeros — MONAI parity).
    pads = []
    for s, r in zip(spatial, roi):
        extra = max(r - s, 0)
        pads.append((extra // 2, extra - extra // 2))
    if any(p != (0, 0) for p in pads):
        inputs = jnp.pad(inputs, [(0, 0)] + pads + [(0, 0)])
    padded_spatial = inputs.shape[1:-1]

    origins = compute_tile_origins(padded_spatial, roi, overlap)
    predictor = jax.jit(predictor)  # predictor is jittable by contract

    if mode == "constant":
        importance = np.ones(roi, dtype=np.float32)
    elif mode == "gaussian":
        importance = _gaussian_importance(roi)
    else:
        raise ValueError(f"unknown blend mode {mode!r}")

    @jax.jit
    def extract(vol, origin):
        start = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), origin,
             jnp.zeros((1,), jnp.int32)])
        return jax.lax.dynamic_slice(
            vol, start, (vol.shape[0], *roi, vol.shape[-1]))

    # Probe output channels with one tile.
    first = predictor(extract(inputs, jnp.zeros((ndim,), jnp.int32)))
    k = first.shape[-1]
    imp = jnp.asarray(importance)[None, ..., None]

    if cpu_accumulate:
        out_sum = np.zeros((b, *padded_spatial, k), dtype=np.float32)
        cnt = np.zeros((1, *padded_spatial, 1), dtype=np.float32)
    else:
        out_sum = jnp.zeros((b, *padded_spatial, k), dtype=jnp.float32)
        cnt = jnp.zeros((1, *padded_spatial, 1), dtype=jnp.float32)

        @jax.jit
        def accumulate(out_sum, cnt, tile_logits, origin):
            start = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32), origin,
                 jnp.zeros((1,), jnp.int32)])
            cur = jax.lax.dynamic_slice(
                out_sum, start, (b, *roi, k))
            out_sum = jax.lax.dynamic_update_slice(
                out_sum, cur + tile_logits * imp, start)
            cur_c = jax.lax.dynamic_slice(cnt, start, (1, *roi, 1))
            cnt = jax.lax.dynamic_update_slice(cnt, cur_c + imp, start)
            return out_sum, cnt

    np_imp = importance[None, ..., None]
    idx = 0
    while idx < len(origins):
        batch_origins = origins[idx:idx + sw_batch_size]
        tiles = jnp.concatenate(
            [extract(inputs, jnp.asarray(o, jnp.int32))
             for o in batch_origins], axis=0)
        logits = predictor(tiles).astype(jnp.float32)
        for j, o in enumerate(batch_origins):
            tile_logits = logits[j * b:(j + 1) * b]
            if cpu_accumulate:
                sl = (slice(None),) + tuple(
                    slice(s, s + r) for s, r in zip(o, roi)) + (
                    slice(None),)
                out_sum[sl] += np.asarray(tile_logits) * np_imp
                cnt[sl[:1] + sl[1:-1] + (slice(None),)] += np_imp
            else:
                out_sum, cnt = accumulate(
                    out_sum, cnt, tile_logits, jnp.asarray(o, jnp.int32))
        idx += sw_batch_size

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
