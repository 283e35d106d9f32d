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

Token layout — (B, h, N, C, L), channels SECOND-minor, window length L
minor. The JL head widths are tiny (C = 4–16); TPU tiles the last two
dims as (8 sublanes, 128 lanes), so a C-minor token tensor lane-pads up
to 32× in HBM (measured: the 128³ train step's stage-0 operands were
(16,1,590,128,4) → 310 MB padded vs 9.7 MB logical, and the attention
custom calls + their pads dominated the step). With L minor the pad is
≤2× at every stage. All kernels and the XLA fallback use this layout.
"""

from __future__ import annotations

import contextlib
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def window_attention_xla(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         bias: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Reference path (identical math to nn/pwa.py's inline einsums).

    q, k: (B, h, N, Cqk, L); v: (B, h, N, Cv, L); bias: (h, L, L).
    Returns (B, h, N, Cv, L) in v.dtype.
    """
    scores = jnp.einsum("bhncl,bhncm->bhnlm", q, k,
                        preferred_element_type=jnp.float32) * scale
    scores = scores + bias[None, :, None].astype(jnp.float32)
    weights = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhnlm,bhncm->bhncl", weights.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    """One (head, batch, window-block) program; everything VMEM-resident.

    Blocks: q/k (1, 1, BN, Cqk, L), v/o (1, 1, BN, Cv, L), bias (1, L, L).
    """
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    # (BN, L, L) batched over the window-block axis; contraction over C.
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    scores = scores + bias_ref[0][None]
    weights = jax.nn.softmax(scores, axis=-1)
    # out[c, l] = Σ_m V[c, m]·W[l, m]
    out = jax.lax.dot_general(
        v, weights, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
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

    b, h, n, c_qk, l = q.shape
    c_v = v.shape[-2]
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
        (1, 1, bn, c, l), lambda hh, bb, nn: (bb, hh, nn, 0, 0),
        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b, h, n_total, c_v, l), v.dtype),
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


_VMEM_BUDGET = 14 << 20  # 16 MB scoped VMEM minus pipelining headroom


def _padded(l: int) -> Tuple[int, int]:
    return -(-l // 8) * 8, -(-l // 128) * 128


def eval_fits_vmem(l: int) -> bool:
    """Can the eval kernel hold one window's scores+weights in VMEM?"""
    sub, lane = _padded(l)
    return 2 * sub * lane * 4 <= _VMEM_BUDGET


def _full_train_fits(l: int) -> bool:
    """Can the full-window backward (≈6 live L×L fp32 buffers) fit VMEM?"""
    sub, lane = _padded(l)
    return 6 * sub * lane * 4 <= _VMEM_BUDGET


def _rowblock_size(l: int) -> int:
    """Row-block size for the flash-style kernels (0 → row blocking not
    feasible). Budget: the (L, L) fp32 bias AND dbias blocks are both
    VMEM-resident in the backward, plus ~6 live (Br, L) fp32 row buffers,
    all within scoped VMEM with headroom for the (small) token blocks."""
    sub, lane = _padded(l)
    # 12 MB minus bias+dbias blocks minus ~2 MB of (padded) token-block
    # double buffering; ~8 live fp32 row buffers at the peak. (13 MB left
    # only 64 KB of slack at L=1024 and large batches tipped the compiler
    # over the 16 MB scoped-vmem limit — chip-measured at bs64.)
    budget = (12 << 20) - 2 * sub * lane * 4 - (2 << 20)
    for br in (512, 256, 128, 64, 32, 16, 8):
        if l % br == 0 and br < l and 8 * br * lane * 4 <= budget:
            return br
    return 0


def train_fits_vmem(l: int) -> bool:
    """Can SOME fused train kernel run at this L? Either the full-window
    kernel fits, or the flash-style row-blocked variant does."""
    return _full_train_fits(l) or _rowblock_size(l) > 0


def _target_platform() -> str:
    """Platform the next computation will actually run on: honors a
    ``jax.default_device`` override (e.g. the speed CLI's host-CPU pass on
    a TPU-backed process, where ``jax.default_backend()`` still says
    "tpu" but Pallas would be lowered for CPU and refuse)."""
    dev = jax.config.jax_default_device
    if dev is not None:
        return getattr(dev, "platform", str(dev))
    return jax.default_backend()


def window_attention(q, k, v, bias, scale: float) -> jnp.ndarray:
    """Fused on TPU, einsum elsewhere. Deterministic (no attn dropout) —
    callers that need weight dropout use :func:`window_attention_train`
    or the XLA path in nn/pwa.py."""
    if _PORTABLE_ONLY:
        return window_attention_xla(q, k, v, bias, scale)
    on_tpu = _target_platform() == "tpu"
    if (on_tpu or _FORCE_INTERPRET) and eval_fits_vmem(q.shape[-1]):
        try:
            return window_attention_pallas(q, k, v, bias, scale,
                                           interpret=not on_tpu)
        except Exception as e:  # pragma: no cover - depends on backend
            _warn_fallback(e)
            return window_attention_xla(q, k, v, bias, scale)
    return window_attention_xla(q, k, v, bias, scale)


_WARNED_FALLBACK = False


def _warn_fallback(exc: Exception) -> None:
    """Log (once) when the Pallas kernel fails and we silently degrade to
    the XLA einsum path — a kernel regression must not be invisible."""
    global _WARNED_FALLBACK
    if not _WARNED_FALLBACK:
        _WARNED_FALLBACK = True
        import logging
        logging.getLogger(__name__).warning(
            "pwa_attention: Pallas kernel failed (%s: %s); falling back to "
            "the XLA attention path for this process.",
            type(exc).__name__, exc)


# ---------------------------------------------------------------------------
# Train mode: fused attention with in-kernel weight dropout + custom VJP.
#
# Forward and backward are separate Pallas kernels sharing the dropout mask
# by construction: the mask is a pure counter-based hash of the GLOBAL
# (window, row, col) coordinates plus a per-step seed, so it regenerates
# identically in the forward, the backward, the row-blocked variants and
# the XLA fallback — and, because the global batch offset is an explicit
# input, also identically on every shard of an SPMD (shard_map) run.
#
# Two kernel families share that mask:
#  * full-window kernels — a block of BN whole windows per grid step; the
#    backward holds ~6 live (BN, L, L) fp32 buffers in VMEM. Used while
#    that fits (L ≲ 700).
#  * row-blocked (flash-style) kernels — grid gains an L/Br row-block
#    axis; the backward streams (Br, L) score rows, accumulates dk/dv
#    across row blocks in the revisited output block and dbias in a
#    VMEM-resident (L, L) block. Exact softmax per row (a full score row
#    is present), so no online-softmax bookkeeping is needed. This covers
#    the 128³ bench config's L=1024 stage that round 2 had to leave on
#    the XLA path (PERF_NOTES.md "Train-step ablation").
#
# The backward recomputes softmax from q/k/bias (nothing but the inputs is
# saved) and emits dq/dk/dv (fp32, cast to primal dtype outside) plus
# dbias accumulated across the grid.
# ---------------------------------------------------------------------------


def _block_windows_train(l: int, budget_bytes: int = 4 << 20) -> int:
    l_sub = -(-l // 8) * 8
    l_lane = -(-l // 128) * 128
    # ~6 live fp32 (bn, L, L) buffers in the backward (S, P, mask, dP, dS,
    # weights) dominate.
    per_window = 6 * l_sub * l_lane * 4
    return max(1, min(128, budget_bytes // per_window))


def _keep_mask(gid, p: float, seed):
    """Counter-based dropout mask: keep with prob (1−p).

    A stateless integer hash (lowbias32 avalanche) of the global element
    id — NOT the hardware PRNG. The hardware stream's bit→element mapping
    depends on how each kernel's draw is vectorized, so a forward and a
    backward kernel can disagree; a counter-based mask is identical across
    kernels, blockings, platforms and the XLA fallback by construction
    (same trick as Philox-offset dropout in CUDA flash-attention kernels).
    """
    x = gid * jnp.uint32(0x9E3779B9) + seed * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    thresh = min((1 << 32) - 1, int(p * float(1 << 32)))
    return x >= jnp.uint32(thresh)


def _dropout_keep(shape, p: float, seed, base, l_rows: int, l_cols: int,
                  row_offset=0):
    """Keep-mask for a (bn, rows, cols) score block.

    ``base`` = global id (batch-major (b, h, n) order) of this block's
    first window; ``row_offset`` = global row index of the block's first
    row (row-blocked kernels); ``l_rows``/``l_cols`` = the full logical
    score dims used to flatten (window, i, j) into a global counter.
    """
    w = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    i = jax.lax.broadcasted_iota(jnp.uint32, shape, 1) + jnp.uint32(row_offset)
    j = jax.lax.broadcasted_iota(jnp.uint32, shape, 2)
    gid = ((base + w) * jnp.uint32(l_rows) + i) * jnp.uint32(l_cols) + j
    return _keep_mask(gid, p, seed)


def _global_window_base(bn: int, batch_offset):
    """Global id of this program's first window, (b, h, n) batch-major
    order over GLOBAL batch indices (local index + ``batch_offset``)."""
    from jax.experimental import pallas as pl
    hh = pl.program_id(0).astype(jnp.uint32)
    bb = pl.program_id(1).astype(jnp.uint32)
    nn = pl.program_id(2).astype(jnp.uint32)
    h_total = jnp.uint32(pl.num_programs(0))
    n_total = jnp.uint32(pl.num_programs(2) * bn)
    return (((batch_offset + bb) * h_total + hh) * n_total
            + nn * jnp.uint32(bn))


def _seed_and_offset(seed_ref):
    return (seed_ref[0, 0].astype(jnp.uint32),
            seed_ref[0, 1].astype(jnp.uint32))


def _softmax_fp32(scores):
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


# -- full-window kernels ----------------------------------------------------


def _train_fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, *,
                      scale: float, p: float):
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    weights = _softmax_fp32(scores + bias_ref[0][None])
    if p > 0.0:
        seed, off = _seed_and_offset(seed_ref)
        bn, l, _ = weights.shape
        keep = _dropout_keep(weights.shape, p, seed,
                             _global_window_base(bn, off), l, l)
        weights = jnp.where(keep, weights * (1.0 / (1.0 - p)), 0.0)
    # out[c, l] = Σ_m V[c, m]·W[l, m]
    out = jax.lax.dot_general(
        v, weights, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[0, 0] = out.astype(o_ref.dtype)


def _train_bwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref,
                      dq_ref, dk_ref, dv_ref, dbias_ref, *,
                      scale: float, p: float):
    from jax.experimental import pallas as pl
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)

    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    prob = _softmax_fp32(scores + bias_ref[0][None])
    if p > 0.0:
        # identical mask to the forward by construction (counter-based)
        seed, off = _seed_and_offset(seed_ref)
        bn, l, _ = prob.shape
        keep = _dropout_keep(prob.shape, p, seed,
                             _global_window_base(bn, off), l, l)
        inv = 1.0 / (1.0 - p)
        weights = jnp.where(keep, prob * inv, 0.0)
    else:
        weights = prob

    # dV[c,m] = Σ_l W[l,m]·dO[c,l]
    dv = jax.lax.dot_general(
        do, weights, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    # dW[l,m] = Σ_c dO[c,l]·V[c,m]
    dw = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    if p > 0.0:
        dprob = jnp.where(keep, dw * inv, 0.0)
    else:
        dprob = dw
    # softmax VJP: dS = P ⊙ (dP − Σ_m P·dP)
    t = prob * dprob
    ds = t - prob * jnp.sum(t, axis=-1, keepdims=True)
    # dq[c,l] = scale·Σ_m K[c,m]·dS[l,m] ; dk[c,m] = scale·Σ_l Q[c,l]·dS[l,m]
    dq = jax.lax.dot_general(
        k, ds, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(
        q, ds, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)

    # dbias accumulates over (batch, window-block) grid steps; the bias
    # block revisits consecutively for a fixed head (grid is h-outermost).
    partial_db = jnp.sum(ds, axis=0)

    @pl.when(jnp.logical_and(pl.program_id(1) == 0, pl.program_id(2) == 0))
    def _():
        dbias_ref[0] = partial_db

    @pl.when(jnp.logical_or(pl.program_id(1) != 0, pl.program_id(2) != 0))
    def _():
        dbias_ref[0] = dbias_ref[0] + partial_db


# -- row-blocked (flash-style) kernels for large L --------------------------


def _train_fwd_rb_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, *,
                         scale: float, p: float, br: int, l: int):
    """Grid (h, b, n): one whole window per step; the L/Br score-row
    blocks are looped IN-kernel (the token tensors are tiny at the JL
    channel widths — only score rows are VMEM-hungry, so streaming rows
    keeps VMEM bounded while the grid stays coarse). Matmuls run in the
    input dtype (bf16 on the MXU in production) with fp32 accumulation —
    matching the XLA einsum path's precision; softmax/dropout arithmetic
    is fp32. Softmax is exact per row (a full score row is present).

    Operands are (…, C, L); score rows index q tokens, so q is transposed
    ONCE in VMEM to (L, C) (tiny). The row-block loop is a STATIC Python
    unroll (L/Br is small): Mosaic has no lowering for dynamic_slice on
    VMEM values, and static slices also skip lane-alignment constraints."""
    k = k_ref[0, 0, 0]                          # (Cqk, L)
    v = v_ref[0, 0, 0]                          # (Cv, L)
    qt = q_ref[0, 0, 0].T                       # (L, Cqk) — one small copy
    if p > 0.0:
        seed, off = _seed_and_offset(seed_ref)
        base = _global_window_base(1, off)

    outs = []
    for rr in range(l // br):
        qr = qt[rr * br:(rr + 1) * br]                    # (Br, Cqk)
        scores = jax.lax.dot_general(
            qr, k, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        weights = _softmax_fp32(
            scores + bias_ref[0, rr * br:(rr + 1) * br, :])
        if p > 0.0:
            keep = _dropout_keep((1, br, l), p, seed, base, l, l,
                                 row_offset=rr * br)[0]
            weights = jnp.where(keep, weights * (1.0 / (1.0 - p)), 0.0)
        # (Cv, Br) directly — no final transpose of the full window
        outs.append(jax.lax.dot_general(
            v, weights.astype(v.dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32))
    o_ref[0, 0, 0] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


def _train_bwd_rb_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref,
                         dq_ref, dk_ref, dv_ref, dbias_ref, *,
                         scale: float, p: float, br: int, l: int):
    """Row-blocked backward, grid (h, b, n). Per window:

    - statically-unrolled L/Br row blocks (no Mosaic lowering exists for
      dynamic_slice on VMEM values): recompute (Br, L) score rows +
      softmax + dropout mask, collect dq row blocks, accumulate dk/dv in
      (C, L) fp32 accumulators, accumulate dbias rows into the per-head
      (L, L) block (revisited consecutively across (b, n) — zeroed at
      its first visit).
    """
    from jax.experimental import pallas as pl
    k = k_ref[0, 0, 0]                          # (Cqk, L)
    v = v_ref[0, 0, 0]                          # (Cv, L)
    qt = q_ref[0, 0, 0].T                       # (L, Cqk)
    dot = do_ref[0, 0, 0].T                     # (L, Cv)
    in_dtype = k.dtype
    if p > 0.0:
        seed, off = _seed_and_offset(seed_ref)
        base = _global_window_base(1, off)
        inv = 1.0 / (1.0 - p)

    first = jnp.logical_and(pl.program_id(1) == 0, pl.program_id(2) == 0)

    @pl.when(first)
    def _():
        dbias_ref[0] = jnp.zeros_like(dbias_ref[0])

    dq_rows = []
    dk_acc = jnp.zeros(k.shape, jnp.float32)
    dv_acc = jnp.zeros(v.shape, jnp.float32)
    for rr in range(l // br):
        row = slice(rr * br, (rr + 1) * br)
        qr = qt[row]                                     # (Br, Cqk)
        dor = dot[row]                                   # (Br, Cv)
        scores = jax.lax.dot_general(
            qr, k, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        prob = _softmax_fp32(scores + bias_ref[0, row, :])
        if p > 0.0:
            # mask recomputed (not held live) wherever needed — the hash
            # is VPU-cheap and each (Br, L) fp32 buffer is VMEM-expensive
            keep = _dropout_keep((1, br, l), p, seed, base, l, l,
                                 row_offset=rr * br)[0]
            weights = jnp.where(keep, prob * inv, 0.0)
        else:
            weights = prob
        # dV[c,m] += Σ_l dO[l,c]·W[l,m]   (weights cast like the XLA path)
        dv_acc = dv_acc + jax.lax.dot_general(
            dor, weights.astype(in_dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (Cv, L)
        del weights
        # dW[l,m] = Σ_c dO[l,c]·V[c,m]
        dw = jax.lax.dot_general(
            dor, v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (Br, L)
        if p > 0.0:
            keep2 = _dropout_keep((1, br, l), p, seed, base, l, l,
                                  row_offset=rr * br)[0]
            dprob = jnp.where(keep2, dw * inv, 0.0)
        else:
            dprob = dw
        # softmax VJP: dS = P ⊙ (dP − Σ_m P·dP)
        t = prob * dprob
        ds = t - prob * jnp.sum(t, axis=-1, keepdims=True)
        dsb = ds.astype(in_dtype)
        # dq[c, row] = scale·K[c,m]·dS[row,m]
        dq_rows.append(jax.lax.dot_general(
            k, dsb, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale)  # (Cqk, Br)
        dk_acc = dk_acc + jax.lax.dot_general(
            qr, dsb, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (Cqk, L)
        dbias_ref[0, row, :] = dbias_ref[0, row, :] + ds

    dq_ref[0, 0, 0] = jnp.concatenate(dq_rows, axis=1).astype(dq_ref.dtype)
    dk_ref[0, 0, 0] = dk_acc.astype(dk_ref.dtype)
    dv_ref[0, 0, 0] = dv_acc.astype(dv_ref.dtype)


# -- pallas_call wrappers ---------------------------------------------------


def _pad_windows(arrs, bn: int, n: int):
    n_pad = (-n) % bn
    if not n_pad:
        return arrs, n
    pad = [(0, 0), (0, 0), (0, n_pad), (0, 0), (0, 0)]
    return [jnp.pad(a, pad) for a in arrs], n + n_pad


def _train_specs(bn, l, c_qk, c_v):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    tok = lambda c: pl.BlockSpec(  # noqa: E731
        (1, 1, bn, c, l), lambda hh, bb, nn: (bb, hh, nn, 0, 0),
        memory_space=pltpu.VMEM)
    seed = pl.BlockSpec((1, 2), lambda hh, bb, nn: (0, 0),
                        memory_space=pltpu.SMEM)
    bias = pl.BlockSpec((1, l, l), lambda hh, bb, nn: (hh, 0, 0),
                        memory_space=pltpu.VMEM)
    return seed, tok, bias


def _rb_specs(l, c_qk, c_v):
    """Specs for the row-blocked kernels: grid (h, b, n), whole-window
    token blocks (tiny at JL widths), per-head (L, L) bias/dbias blocks."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    full = lambda c: pl.BlockSpec(  # noqa: E731
        (1, 1, 1, c, l), lambda hh, bb, nn: (bb, hh, nn, 0, 0),
        memory_space=pltpu.VMEM)
    seed = pl.BlockSpec((1, 2), lambda hh, bb, nn: (0, 0),
                        memory_space=pltpu.SMEM)
    bias_full = pl.BlockSpec((1, l, l), lambda hh, bb, nn: (hh, 0, 0),
                             memory_space=pltpu.VMEM)
    return seed, full, bias_full


def _train_fwd_pallas(q, k, v, bias, seed, scale, p, interpret=False):
    from jax.experimental import pallas as pl

    b, h, n, c_qk, l = q.shape
    c_v = v.shape[-2]
    if _full_train_fits(l):
        bn = min(_block_windows_train(l), n)
        (q, k, v), n_total = _pad_windows([q, k, v], bn, n)
        seed_spec, tok, bias_spec = _train_specs(bn, l, c_qk, c_v)
        out = pl.pallas_call(
            functools.partial(_train_fwd_kernel, scale=scale, p=p),
            out_shape=jax.ShapeDtypeStruct((b, h, n_total, c_v, l), v.dtype),
            grid=(h, b, n_total // bn),
            in_specs=[seed_spec, tok(c_qk), tok(c_qk), tok(c_v), bias_spec],
            out_specs=tok(c_v),
            interpret=interpret,
        )(seed, q, k, v, bias.astype(jnp.float32))
        return out[:, :, :n] if n_total != n else out

    br = _rowblock_size(l)
    assert br > 0, f"no fused train kernel fits L={l}"
    seed_spec, full, bias_full = _rb_specs(l, c_qk, c_v)
    return pl.pallas_call(
        functools.partial(_train_fwd_rb_kernel, scale=scale, p=p,
                          br=br, l=l),
        out_shape=jax.ShapeDtypeStruct((b, h, n, c_v, l), v.dtype),
        grid=(h, b, n),
        in_specs=[seed_spec, full(c_qk), full(c_qk), full(c_v), bias_full],
        out_specs=full(c_v),
        interpret=interpret,
    )(seed, q, k, v, bias.astype(jnp.float32))


def _train_bwd_pallas(q, k, v, bias, seed, do, scale, p, interpret=False):
    from jax.experimental import pallas as pl

    b, h, n, c_qk, l = q.shape
    c_v = v.shape[-2]
    if _full_train_fits(l):
        bn = min(_block_windows_train(l), n)
        (q, k, v, do), n_total = _pad_windows([q, k, v, do], bn, n)
        seed_spec, tok, bias_spec = _train_specs(bn, l, c_qk, c_v)
        dq, dk, dv, dbias = pl.pallas_call(
            functools.partial(_train_bwd_kernel, scale=scale, p=p),
            out_shape=(
                jax.ShapeDtypeStruct((b, h, n_total, c_qk, l), q.dtype),
                jax.ShapeDtypeStruct((b, h, n_total, c_qk, l), k.dtype),
                jax.ShapeDtypeStruct((b, h, n_total, c_v, l), v.dtype),
                jax.ShapeDtypeStruct((h, l, l), jnp.float32),
            ),
            grid=(h, b, n_total // bn),
            in_specs=[seed_spec, tok(c_qk), tok(c_qk), tok(c_v), bias_spec,
                      tok(c_v)],
            out_specs=(tok(c_qk), tok(c_qk), tok(c_v), bias_spec),
            interpret=interpret,
        )(seed, q, k, v, bias.astype(jnp.float32), do)
        if n_total != n:
            dq, dk, dv = dq[:, :, :n], dk[:, :, :n], dv[:, :, :n]
        return dq, dk, dv, dbias

    br = _rowblock_size(l)
    assert br > 0, f"no fused train kernel fits L={l}"
    seed_spec, full, bias_full = _rb_specs(l, c_qk, c_v)
    return pl.pallas_call(
        functools.partial(_train_bwd_rb_kernel, scale=scale, p=p,
                          br=br, l=l),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, n, c_qk, l), q.dtype),
            jax.ShapeDtypeStruct((b, h, n, c_qk, l), k.dtype),
            jax.ShapeDtypeStruct((b, h, n, c_v, l), v.dtype),
            jax.ShapeDtypeStruct((h, l, l), jnp.float32),
        ),
        grid=(h, b, n),
        in_specs=[seed_spec, full(c_qk), full(c_qk), full(c_v), bias_full,
                  full(c_v)],
        out_specs=(full(c_qk), full(c_qk), full(c_v), bias_full),
        interpret=interpret,
    )(seed, q, k, v, bias.astype(jnp.float32), do)


def _train_xla(q, k, v, bias, seed, scale, p):
    """XLA path with the SAME counter-based dropout mask as the kernels —
    bit-identical whenever the kernels run one window per block (bn=1, the
    case for every L ≥ ~256 including the row-blocked path) or the window
    count is a block multiple (no padding). Serves as both the off-TPU
    fallback and the parity oracle."""
    b, h, n, _, l = q.shape
    scores = jnp.einsum("bhncl,bhncm->bhnlm",
                        q.astype(jnp.float32), k.astype(jnp.float32),
                        preferred_element_type=jnp.float32) * scale
    weights = jax.nn.softmax(scores + bias[None, :, None], axis=-1)
    if p > 0.0:
        s = seed[0, 0].astype(jnp.uint32)
        off = seed[0, 1].astype(jnp.uint32)
        # global window ids, batch-major (b, h, n) order
        wid = ((off + jnp.arange(b, dtype=jnp.uint32))[:, None, None]
               * jnp.uint32(h)
               + jnp.arange(h, dtype=jnp.uint32)[None, :, None]
               ) * jnp.uint32(n) + jnp.arange(n, dtype=jnp.uint32)
        i = jnp.arange(l, dtype=jnp.uint32)
        gid = ((wid[..., None, None] * jnp.uint32(l) + i[:, None])
               * jnp.uint32(l) + i[None, :])
        keep = _keep_mask(gid, p, s)
        weights = jnp.where(keep, weights / (1.0 - p), 0.0)
    return jnp.einsum("bhnlm,bhncm->bhncl", weights,
                      v.astype(jnp.float32),
                      preferred_element_type=jnp.float32).astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def window_attention_train(q, k, v, bias, seed, scale: float, p: float,
                           interpret: bool = False):
    """Fused attention with in-kernel weight dropout (training path).

    ``seed``: (1, 2) int32 ``[step_seed, global_batch_offset]`` — fold a
    fresh seed in per step; the batch offset is 0 single-device and
    ``axis_index('data') * local_batch`` under shard_map, which makes the
    dropout mask bit-identical to the unsharded run. Differentiable in
    q/k/v/bias.
    """
    return _train_fwd_pallas(q, k, v, bias, seed, scale, p,
                             interpret=interpret)


def _wat_fwd(q, k, v, bias, seed, scale, p, interpret):
    out = _train_fwd_pallas(q, k, v, bias, seed, scale, p,
                            interpret=interpret)
    return out, (q, k, v, bias, seed)


def _wat_bwd(scale, p, interpret, res, g):
    q, k, v, bias, seed = res
    dq, dk, dv, dbias = _train_bwd_pallas(q, k, v, bias, seed, g, scale, p,
                                          interpret=interpret)
    seed_zero = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return (dq, dk, dv, dbias.astype(bias.dtype), seed_zero)


window_attention_train.defvjp(_wat_fwd, _wat_bwd)


# ---------------------------------------------------------------------------
# Dispatch state: fused-kernel toggle, interpret forcing (CPU tests), and
# the SPMD mesh scope that lets the sharded step keep the kernel ON by
# wrapping attention calls in shard_map (GSPMD cannot partition a pallas
# custom call, but the windows are embarrassingly parallel over batch).
# ---------------------------------------------------------------------------

_TRAIN_FUSED = True
_FORCE_INTERPRET = False
_PORTABLE_ONLY = False
_SPMD_MESH: Optional[object] = None


@contextlib.contextmanager
def portable_scope():
    """While active, attention dispatch never emits a Pallas (Mosaic)
    custom call — pure StableHLO only. Used by :mod:`..infer.export` so
    serialized serving artifacts stay platform-portable and stable across
    jaxlib versions (jax.export flags non-stable custom calls); XLA
    re-fuses the einsum+softmax chain at artifact compile time."""
    global _PORTABLE_ONLY
    prev = _PORTABLE_ONLY
    _PORTABLE_ONLY = True
    try:
        yield
    finally:
        _PORTABLE_ONLY = prev


def set_train_fused(enabled: bool) -> None:
    global _TRAIN_FUSED
    _TRAIN_FUSED = bool(enabled)


def set_force_interpret(enabled: bool) -> None:
    """Test hook: run the Pallas kernels in interpret mode on non-TPU
    backends (the CPU-mesh suite uses this to exercise the fused path)."""
    global _FORCE_INTERPRET
    _FORCE_INTERPRET = bool(enabled)


def force_interpret() -> bool:
    return _FORCE_INTERPRET and _target_platform() != "tpu"


@contextlib.contextmanager
def spmd_scope(mesh):
    """While active, PWA attention dispatch wraps the fused kernels in
    ``jax.shard_map`` over ``mesh`` (batch split on the ``data`` axis).
    The sharded step builders enter this scope around every step call so
    (re)tracing under the mesh picks it up; single-device steps traced
    outside the scope are unaffected."""
    global _SPMD_MESH
    prev = _SPMD_MESH
    _SPMD_MESH = mesh
    try:
        yield
    finally:
        _SPMD_MESH = prev


def spmd_mesh():
    return _SPMD_MESH


def train_fused_enabled(tokens: int = 0) -> bool:
    """``tokens`` = L (modalities · tokens-per-window) of the level asking;
    levels whose windows exceed every fused backward's VMEM fit stay on
    the XLA path."""
    return (_TRAIN_FUSED
            and not _PORTABLE_ONLY
            and (_target_platform() == "tpu" or force_interpret())
            and (tokens == 0 or train_fits_vmem(tokens)))
