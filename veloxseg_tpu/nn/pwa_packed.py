"""Packed (2x2x2 space-to-depth) execution of the PWA attention branch.

Why this exists
---------------
The attention branch's voxel tensors have tiny channel counts (16-128 at
the four stages), and the round-5 layout audit (PERF_NOTES "round 5")
showed XLA physically lane-pads them up to 4x in HBM: the branch ran at
0.5% MFU / 540 GB/s and accounted for 42% of the fenced 128^3 train
step. The fix is the same space-to-depth trick the conv path uses
(``ops/packed_conv.py``): keep every voxel tensor in the parity-major
packed layout ``(B, D/2, H/2, W/2, 8*C)`` whose minor dim is a lane
multiple (8*16 = 128), and absorb the layout change into the existing
trace-time weight transforms.

The window algebra composes exactly with this layout:

- a big window with even extent is a whole number of packed blocks, so
  the window gather stays a pure reshape/transpose chain; the in-window
  token coordinate ``t = 2*tp + r`` splits into (packed position,
  parity) *per axis*, so emitting tokens in LOGICAL order is still a
  plain transpose (no permutation of the position-bias table needed);
- a small-window max-pool with even extent pools whole packed blocks
  plus the parity slots - one fused reduce;
- the align-corners scatter upsample emits voxels in logical order,
  and splitting each big-window axis ``b = 2*vp + r`` re-packs the
  output with one transpose;
- per-voxel Dense/LayerNorm become per-parity-slot ops: Dense via the
  permuted block-diagonal weight expansions below (an MXU-shaped
  (8*cin, 8*cout) matmul - the "wasted" zero-block FLOPs cost nothing
  against a K=16 matmul that would idle 7/8 of the systolic array),
  LayerNorm via a segmented normalization the compiler fuses.

Reference semantics are unchanged (``model/components/PWA.py``); every
function here is bit-compatible-in-structure with the unpacked path in
``nn/pwa.py`` (same parameters, same math, fp32 stats), covered by
``tests/test_pwa_packed.py``.
"""

from __future__ import annotations

import math
import os
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..core.windows import WindowLayout
from ..ops.resize import interp_matrix

_ENABLED = os.environ.get("VELOXSEG_PACKED_ATTN", "1") != "0"


def enabled() -> bool:
    return _ENABLED


def set_enabled(value: bool) -> None:
    global _ENABLED
    _ENABLED = bool(value)


def packable(layout: WindowLayout, spatial: Sequence[int]) -> bool:
    """True iff this level's window pyramid aligns with 2x packing at the
    given runtime spatial size: even extents, and per pair either pure
    voxel tokens (small==1, big even) or even small windows."""
    if not _ENABLED:
        return False
    if any(s % 2 for s in spatial):
        return False
    for p in range(layout.num_pairs):
        small = layout.small_windows[p]
        if all(s == 1 for s in small):
            continue  # even big: pure factor transpose; odd big: the
            #           per-pair unpack fallback in the gather/scatter
        elif all(s % 2 == 0 for s in small):
            continue
        else:  # mixed per-axis small sizes: fall back to unpacked
            return False
    return True


# ---------------------------------------------------------------------------
# Trace-time weight expansions (logical kernel -> per-parity block matrix).
# ---------------------------------------------------------------------------

def _eye8(dtype) -> jnp.ndarray:
    return jnp.asarray(np.eye(8, dtype=np.float32), dtype)


def dense_parity(kernel: jnp.ndarray) -> jnp.ndarray:
    """(cin, cout) -> (8*cin, 8*cout); rows (r, cin), cols (r, cout)."""
    cin, cout = kernel.shape
    big = jnp.einsum("rs,cd->rcsd", _eye8(kernel.dtype), kernel)
    return big.reshape(8 * cin, 8 * cout)


def qkv_parity(kernel: jnp.ndarray, pairs: int) -> jnp.ndarray:
    """(cin, P*hcj) -> (8*cin, P*8*hcj); rows (r, cin), cols PAIR-major
    (p, r, hcj) so each pair's slice of the output stream is contiguous
    for the window gather."""
    cin = kernel.shape[0]
    hcj = kernel.shape[1] // pairs
    w = kernel.reshape(cin, pairs, hcj)
    big = jnp.einsum("rs,cpj->rcpsj", _eye8(kernel.dtype), w)
    return big.reshape(8 * cin, pairs * 8 * hcj)


def mix_parity(kernel: jnp.ndarray, pairs: int) -> jnp.ndarray:
    """(P*hdv, cout) -> (P*8*hdv, 8*cout); rows pair-major (p, r, hdv)
    matching the packed scatter's channel concat, cols (r, cout)."""
    hdv = kernel.shape[0] // pairs
    cout = kernel.shape[1]
    w = kernel.reshape(pairs, hdv, cout)
    big = jnp.einsum("rs,pjc->prjsc", _eye8(kernel.dtype), w)
    return big.reshape(pairs * 8 * hdv, 8 * cout)


def concat_parity(kernel: jnp.ndarray, splits: Sequence[int]) -> jnp.ndarray:
    """Expansion for a Dense applied to a channel-concat of several packed
    streams: rows (src, r, c_src) per source block, cols (r, cout).
    ``splits`` are the logical channel counts of the concatenated inputs
    (summing to kernel.shape[0])."""
    parts = []
    off = 0
    for c in splits:
        parts.append(dense_parity(kernel[off:off + c]))
        off += c
    return jnp.concatenate(parts, axis=0)


def tile8(bias: jnp.ndarray) -> jnp.ndarray:
    """(..., C) -> (..., 8*C) parity-major ((r, c), bias shared per r)."""
    reps = (1,) * (bias.ndim - 1) + (8,)
    return jnp.tile(bias, reps)


def qkv_bias_tile(bias: jnp.ndarray, pairs: int) -> jnp.ndarray:
    """(P*hcj,) -> (P*8*hcj,) pair-major (p, r, hcj)."""
    hcj = bias.shape[0] // pairs
    return jnp.tile(bias.reshape(pairs, 1, hcj), (1, 8, 1)).reshape(-1)


def seg_layer_norm(x: jnp.ndarray, nseg: int = 8,
                   eps: float = 1e-6) -> jnp.ndarray:
    """LayerNorm over each of ``nseg`` equal segments of the minor axis
    (fp32 stats, no affine - callers apply tiled scale/bias). The
    (..., nseg, c) view only exists inside the reduce+normalize fusion;
    nothing narrow is materialized."""
    c = x.shape[-1] // nseg
    xf = x.astype(jnp.float32).reshape(*x.shape[:-1], nseg, c)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) / jnp.sqrt(var + eps)
    return y.reshape(x.shape).astype(x.dtype)


# ---------------------------------------------------------------------------
# Window gather / scatter on packed streams.
# ---------------------------------------------------------------------------

def window_gather_packed(xp: jnp.ndarray, layout: WindowLayout,
                         c_per: int) -> jnp.ndarray:
    """(B, D/2, H/2, W/2, P*8*h*c) pair-major -> (B, h, sum N_p, c, l).

    Token order along ``l`` is LOGICAL (row-major over the in-window
    voxel/token grid), identical to :func:`nn.pwa.window_gather` - the
    in-window coordinate ``t = 2*tp + r`` is a factor split, so logical
    order falls out of the transpose directly and the position-bias
    table applies unchanged.
    """
    b = xp.shape[0]
    sp = xp.shape[1:4]
    heads = layout.num_heads
    tok = layout.tokens_per_axis
    chunk = 8 * heads * c_per
    xs = []
    for p in range(layout.num_pairs):
        small = layout.small_windows[p]
        big = layout.big_windows[p]
        grid = tuple((2 * s) // bw for s, bw in zip(sp, big))
        xi = xp[..., p * chunk:(p + 1) * chunk]
        if all(s == 1 for s in small) and any(b % 2 for b in big):
            # odd big window (e.g. the 3³ pairs of the 96³ configs):
            # windows cross packed-block boundaries — unpack only this
            # pair's slice (1/P of the stream) and gather logically.
            from ..ops import packed_conv
            xi = packed_conv.unpack_s2d(xi, heads * c_per)
            xi = xi.reshape(b, grid[0], tok[0], grid[1], tok[1],
                            grid[2], tok[2], heads, c_per)
            xi = xi.transpose(0, 7, 1, 3, 5, 8, 2, 4, 6)
            xi = xi.reshape(b, heads, math.prod(grid), c_per,
                            math.prod(tok))
        elif all(s == 1 for s in small):
            wp = tuple(bw // 2 for bw in big)
            xi = xi.reshape(b, grid[0], wp[0], grid[1], wp[1],
                            grid[2], wp[2], 2, 2, 2, heads, c_per)
            # token axis per dim = (wp_d, r_d) interleaved -> logical
            xi = xi.transpose(0, 10, 1, 3, 5, 11, 2, 7, 4, 8, 6, 9)
            xi = xi.reshape(b, heads, math.prod(grid), c_per,
                            math.prod(tok))
        else:
            spd = tuple(s // 2 for s in small)
            xi = xi.reshape(b,
                            grid[0], tok[0], spd[0],
                            grid[1], tok[1], spd[1],
                            grid[2], tok[2], spd[2],
                            2, 2, 2, heads, c_per)
            # small-window max-pool = packed blocks x parity slots
            xi = xi.max(axis=(3, 6, 9, 10, 11, 12))
            xi = xi.transpose(0, 7, 1, 3, 5, 8, 2, 4, 6)
            xi = xi.reshape(b, heads, math.prod(grid), c_per,
                            math.prod(tok))
        xs.append(xi)
    return jnp.concatenate(xs, axis=2)


def window_scatter_packed(tokens: jnp.ndarray, layout: WindowLayout,
                          c_per: int, spatial=None) -> jnp.ndarray:
    """(B, h, sum N_p, c, l) logical-order tokens ->
    (B, D/2, H/2, W/2, P*8*h*c) pair-major packed voxels.

    Same align-corners per-axis upsample as :func:`nn.pwa.window_scatter`;
    the upsampled big-window axis ``bd = 2*vp + r`` splits back into
    (packed position, parity) with one transpose. ``spatial`` is the
    LOGICAL feature size (defaults to the layout's input size).
    """
    b, heads = tokens.shape[:2]
    if spatial is None:
        spatial = layout.input_size
    sp = tuple(s // 2 for s in spatial)
    tok = layout.tokens_per_axis
    outs = []
    idx = 0
    for p in range(layout.num_pairs):
        small = layout.small_windows[p]
        big = layout.big_windows[p]
        grid = tuple(s // bw for s, bw in zip(spatial, big))
        n = math.prod(grid)
        a = tokens[:, :, idx:idx + n]
        idx += n
        a = a.reshape(b, heads, *grid, c_per, *tok)
        if all(s == 1 for s in small) and any(bw % 2 for bw in big):
            # odd big window: scatter logically, pack this pair's slice
            from ..ops import packed_conv
            a = a.transpose(0, 2, 6, 3, 7, 4, 8, 1, 5)
            a = a.reshape(b, *spatial, heads * c_per)
            outs.append(packed_conv.pack_s2d(a))
            continue
        for axis, (t, s) in enumerate(zip(tok, small)):
            if s == 1:
                continue
            w = interp_matrix(t, t * s, dtype=a.dtype)
            a = jnp.moveaxis(
                jnp.tensordot(w, a, axes=((1,), (6 + axis,)),
                              precision="highest"), 0, 6 + axis)
        wp = tuple(bw // 2 for bw in big)
        a = a.reshape(b, heads, *grid, c_per,
                      wp[0], 2, wp[1], 2, wp[2], 2)
        a = a.transpose(0, 2, 6, 3, 8, 4, 10, 7, 9, 11, 1, 5)
        a = a.reshape(b, sp[0], sp[1], sp[2], 8 * heads * c_per)
        outs.append(a)
    return jnp.concatenate(outs, axis=-1)
