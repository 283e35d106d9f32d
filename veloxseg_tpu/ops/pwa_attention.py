"""Fused paired-window attention core — Pallas TPU kernel.

The PWA attention at each level is a batch of tiny attentions: one per
(batch, head, window) over ``L = num_modalities · tokens_per_window``
tokens (L ≈ 27–64). The XLA path (``nn/pwa.py``) materializes the score
and softmax-weight tensors ``(B, h, N, L, L)`` in HBM between the two
batched matmuls — at the 96³ eval config that is ~100 MB written + read
per level-1 block, a large fraction of the whole forward's HBM traffic
(PERF_NOTES.md). This kernel runs score → (+bias) → softmax → ·V for a
block of windows entirely in VMEM, so HBM sees only q/k/v once in and the
attention output once out (flash-attention structure; no online softmax
needed because a whole window's L×L scores fit comfortably in VMEM).

Replaces: reference ``attention_operation`` (``model/components/
PWA.py:87-103``) — einsum·scale + position bias + softmax + einsum.

Dispatch mirrors :mod:`veloxseg_tpu.ops.wkv`: Pallas on TPU, einsum
fallback elsewhere (and under dropout, where the XLA path's explicit
weight tensor is needed for the dropout mask).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp


def window_attention_xla(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         bias: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Reference path (identical math to nn/pwa.py's inline einsums).

    q, k: (B, h, N, L, Cqk); v: (B, h, N, L, Cv); bias: (h, L, L).
    Returns (B, h, N, L, Cv) in v.dtype.
    """
    scores = jnp.einsum("bhnlc,bhnmc->bhnlm", q, k,
                        preferred_element_type=jnp.float32) * scale
    scores = scores + bias[None, :, None].astype(jnp.float32)
    weights = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhnlm,bhnmc->bhnlc", weights.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    """One (head, batch, window-block) program; everything VMEM-resident.

    Blocks: q/k (1, 1, BN, L, Cqk), v/o (1, 1, BN, L, Cv), bias (1, L, L).
    """
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    # (BN, L, L) batched over the window-block axis.
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    scores = scores + bias_ref[0][None]
    weights = jax.nn.softmax(scores, axis=-1)
    out = jax.lax.dot_general(
        weights, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[0, 0] = out.astype(o_ref.dtype)


def window_attention_pallas(q, k, v, bias, scale: float,
                            block_windows: int = 0,
                            interpret: bool = False) -> jnp.ndarray:
    """Fused attention over (B, h, N, L, C) token tensors.

    ``block_windows`` = windows per grid step (0 → auto from a ~2 MB VMEM
    budget for the score block). N is zero-padded to a block multiple —
    padded windows compute a harmless uniform softmax and are sliced off.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, n, l, c_qk = q.shape
    c_v = v.shape[-1]
    if block_windows <= 0:
        # Mosaic pads the last two dims to (sublane, 128-lane) tiles, so
        # budget VMEM on the PADDED score shape: (BN, ⌈L/8⌉·8, 128·⌈L/128⌉)
        # fp32, ×2 live copies (scores + softmax weights), within the 16 MB
        # scoped-VMEM limit with headroom for q/k/v/out double buffering.
        l_sub = -(-l // 8) * 8
        l_lane = -(-l // 128) * 128
        per_window = 2 * l_sub * l_lane * 4
        block_windows = max(1, min(256, (4 << 20) // per_window))
    bn = min(block_windows, n)
    n_pad = (-n) % bn
    if n_pad:
        pad = [(0, 0), (0, 0), (0, n_pad), (0, 0), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    n_total = n + n_pad

    grid = (h, b, n_total // bn)
    tok_spec = lambda c: pl.BlockSpec(  # noqa: E731
        (1, 1, bn, l, c), lambda hh, bb, nn: (bb, hh, nn, 0, 0),
        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b, h, n_total, l, c_v), v.dtype),
        grid=grid,
        in_specs=[
            tok_spec(c_qk), tok_spec(c_qk), tok_spec(c_v),
            pl.BlockSpec((1, l, l), lambda hh, bb, nn: (hh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tok_spec(c_v),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * n_total * l * l * max(c_qk, c_v),
            bytes_accessed=(q.size + k.size) * q.dtype.itemsize
            + 2 * v.size * v.dtype.itemsize,
            transcendentals=b * h * n_total * l * l,
        ),
    )(q, k, v, bias.astype(jnp.float32))
    if n_pad:
        out = out[:, :, :n]
    return out


def window_attention(q, k, v, bias, scale: float) -> jnp.ndarray:
    """Fused on TPU, einsum elsewhere. Deterministic (no attn dropout) —
    callers that need weight dropout use the XLA path in nn/pwa.py."""
    platform = jax.default_backend()
    if platform == "tpu":
        try:
            return window_attention_pallas(q, k, v, bias, scale)
        except Exception:
            return window_attention_xla(q, k, v, bias, scale)
    return window_attention_xla(q, k, v, bias, scale)
