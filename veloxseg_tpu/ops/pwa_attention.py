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
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


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


_VMEM_BUDGET = 14 << 20  # 16 MB scoped VMEM minus pipelining headroom


def _padded(l: int) -> Tuple[int, int]:
    return -(-l // 8) * 8, -(-l // 128) * 128


def eval_fits_vmem(l: int) -> bool:
    """Can the eval kernel hold one window's scores+weights in VMEM?"""
    sub, lane = _padded(l)
    return 2 * sub * lane * 4 <= _VMEM_BUDGET


def train_fits_vmem(l: int) -> bool:
    """Can the backward kernel (≈6 live L×L fp32 buffers) fit VMEM?"""
    sub, lane = _padded(l)
    return 6 * sub * lane * 4 <= _VMEM_BUDGET


def window_attention(q, k, v, bias, scale: float) -> jnp.ndarray:
    """Fused on TPU, einsum elsewhere. Deterministic (no attn dropout) —
    callers that need weight dropout use :func:`window_attention_train`
    or the XLA path in nn/pwa.py."""
    platform = jax.default_backend()
    if platform == "tpu" and eval_fits_vmem(q.shape[-2]):
        try:
            return window_attention_pallas(q, k, v, bias, scale)
        except Exception:
            return window_attention_xla(q, k, v, bias, scale)
    return window_attention_xla(q, k, v, bias, scale)


# ---------------------------------------------------------------------------
# Train mode: fused attention with in-kernel weight dropout + custom VJP.
#
# Forward and backward are separate Pallas kernels sharing the dropout mask
# by construction: both seed the per-core PRNG with (seed + flat grid
# index) and draw bits in the same order, so the mask regenerates exactly
# (the CUDA-flash-attention recompute trick, PRNG edition). The backward
# recomputes softmax from q/k/bias (nothing but the inputs is saved) and
# emits dq/dk/dv plus dbias accumulated across the window grid.
# ---------------------------------------------------------------------------


def _block_windows_train(l: int, budget_bytes: int = 4 << 20) -> int:
    l_sub = -(-l // 8) * 8
    l_lane = -(-l // 128) * 128
    # ~6 live fp32 (bn, L, L) buffers in the backward (S, P, mask, dP, dS,
    # weights) dominate.
    per_window = 6 * l_sub * l_lane * 4
    return max(1, min(128, budget_bytes // per_window))


def _dropout_keep(shape, p: float, seed, base):
    """Counter-based dropout mask: keep with prob (1−p).

    A stateless integer hash of (global element id, seed) — NOT the
    hardware PRNG. The hardware stream's bit→element mapping depends on
    how each kernel's draw is vectorized, so a forward and a backward
    kernel can disagree; a counter-based mask is identical across kernels,
    platforms and the XLA fallback by construction (same trick as
    Philox-offset dropout in CUDA flash-attention kernels).

    ``shape`` = (bn, l, l); ``base`` = global index of this block's first
    window (uint32 scalar); ``seed`` = uint32 scalar.
    """
    w = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    i = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    j = jax.lax.broadcasted_iota(jnp.uint32, shape, 2)
    l_rows = jnp.uint32(shape[-2])
    l_cols = jnp.uint32(shape[-1])
    gid = ((base + w) * l_rows + i) * l_cols + j
    # xorshift-multiply avalanche (lowbias32)
    x = gid * jnp.uint32(0x9E3779B9) + seed * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    thresh = min((1 << 32) - 1, int(p * float(1 << 32)))
    return x >= jnp.uint32(thresh)


def _block_window_base(bn: int):
    """Global index of the first window in this program's block."""
    from jax.experimental import pallas as pl
    hh = pl.program_id(0)
    bb = pl.program_id(1)
    nn = pl.program_id(2)
    block = (hh * pl.num_programs(1) + bb) * pl.num_programs(2) + nn
    return block.astype(jnp.uint32) * jnp.uint32(bn)


def _softmax_fp32(scores):
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _train_fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, *,
                      scale: float, p: float):
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    weights = _softmax_fp32(scores + bias_ref[0][None])
    if p > 0.0:
        keep = _dropout_keep(weights.shape, p,
                             seed_ref[0, 0].astype(jnp.uint32),
                             _block_window_base(weights.shape[0]))
        weights = jnp.where(keep, weights * (1.0 / (1.0 - p)), 0.0)
    out = jax.lax.dot_general(
        weights, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
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
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    prob = _softmax_fp32(scores + bias_ref[0][None])
    if p > 0.0:
        # identical mask to the forward by construction (counter-based)
        keep = _dropout_keep(prob.shape, p,
                             seed_ref[0, 0].astype(jnp.uint32),
                             _block_window_base(prob.shape[0]))
        inv = 1.0 / (1.0 - p)
        weights = jnp.where(keep, prob * inv, 0.0)
    else:
        weights = prob

    # dV[m,c] = Σ_l W[l,m]·dO[l,c]
    dv = jax.lax.dot_general(
        weights, do, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    # dW[l,m] = Σ_c dO[l,c]·V[m,c]
    dw = jax.lax.dot_general(
        do, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    if p > 0.0:
        dprob = jnp.where(keep, dw * inv, 0.0)
    else:
        dprob = dw
    # softmax VJP: dS = P ⊙ (dP − Σ_m P·dP)
    t = prob * dprob
    ds = t - prob * jnp.sum(t, axis=-1, keepdims=True)
    # dq[l,c] = scale·Σ_m dS[l,m]·K[m,c] ; dk[m,c] = scale·Σ_l dS[l,m]·Q[l,c]
    dq = jax.lax.dot_general(
        ds, k, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(
        ds, q, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
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
        (1, 1, bn, l, c), lambda hh, bb, nn: (bb, hh, nn, 0, 0),
        memory_space=pltpu.VMEM)
    seed = pl.BlockSpec((1, 1), lambda hh, bb, nn: (0, 0),
                        memory_space=pltpu.SMEM)
    bias = pl.BlockSpec((1, l, l), lambda hh, bb, nn: (hh, 0, 0),
                        memory_space=pltpu.VMEM)
    return seed, tok, bias


def _train_fwd_pallas(q, k, v, bias, seed, scale, p, interpret=False):
    from jax.experimental import pallas as pl

    b, h, n, l, c_qk = q.shape
    c_v = v.shape[-1]
    bn = min(_block_windows_train(l), n)
    (q, k, v), n_total = _pad_windows([q, k, v], bn, n)
    seed_spec, tok, bias_spec = _train_specs(bn, l, c_qk, c_v)
    out = pl.pallas_call(
        functools.partial(_train_fwd_kernel, scale=scale, p=p),
        out_shape=jax.ShapeDtypeStruct((b, h, n_total, l, c_v), v.dtype),
        grid=(h, b, n_total // bn),
        in_specs=[seed_spec, tok(c_qk), tok(c_qk), tok(c_v), bias_spec],
        out_specs=tok(c_v),
        interpret=interpret,
    )(seed, q, k, v, bias.astype(jnp.float32))
    return out[:, :, :n] if n_total != n else out


def _train_bwd_pallas(q, k, v, bias, seed, do, scale, p, interpret=False):
    from jax.experimental import pallas as pl

    b, h, n, l, c_qk = q.shape
    c_v = v.shape[-1]
    bn = min(_block_windows_train(l), n)
    (q, k, v, do), n_total = _pad_windows([q, k, v, do], bn, n)
    seed_spec, tok, bias_spec = _train_specs(bn, l, c_qk, c_v)
    dq, dk, dv, dbias = pl.pallas_call(
        functools.partial(_train_bwd_kernel, scale=scale, p=p),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, n_total, l, c_qk), q.dtype),
            jax.ShapeDtypeStruct((b, h, n_total, l, c_qk), k.dtype),
            jax.ShapeDtypeStruct((b, h, n_total, l, c_v), v.dtype),
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


def _train_xla(q, k, v, bias, seed, scale, p):
    """XLA path with the SAME counter-based dropout mask as the kernels —
    bit-identical when the window count is a block multiple (no padding),
    which makes it both the off-TPU fallback and the parity oracle."""
    b, h, n, l, _ = q.shape
    scores = jnp.einsum("bhnlc,bhnmc->bhnlm",
                        q.astype(jnp.float32), k.astype(jnp.float32),
                        preferred_element_type=jnp.float32) * scale
    weights = jax.nn.softmax(scores + bias[None, :, None], axis=-1)
    if p > 0.0:
        flat = weights.reshape(b * h * n, l, l)
        # global window order in the kernels is (h, b, n) — match it.
        order = jnp.arange(h * b * n, dtype=jnp.uint32).reshape(h, b, n)
        base = jnp.transpose(order, (1, 0, 2)).reshape(-1)
        keep = jax.vmap(
            lambda gw: _dropout_keep((1, l, l), p,
                                     seed[0, 0].astype(jnp.uint32), gw)
        )(base)[:, 0]
        weights = jnp.where(keep.reshape(weights.shape),
                            weights / (1.0 - p), 0.0)
    return jnp.einsum("bhnlm,bhnmc->bhnlc", weights,
                      v.astype(jnp.float32),
                      preferred_element_type=jnp.float32).astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def window_attention_train(q, k, v, bias, seed, scale: float, p: float,
                           interpret: bool = False):
    """Fused attention with in-kernel weight dropout (training path).

    ``seed``: (1, 1) int32 — fold a fresh value in per step (the kernel
    derives per-window streams from it). Differentiable in q/k/v/bias.
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


# Process-level toggle for the fused train path. GSPMD cannot partition
# the pallas custom-call, so mesh/SPMD step builders switch it off
# (sticky for the process — mesh and single-chip training don't share
# processes in practice); it is also inert off-TPU.
_TRAIN_FUSED = True


def set_train_fused(enabled: bool) -> None:
    global _TRAIN_FUSED
    _TRAIN_FUSED = bool(enabled)


def train_fused_enabled(tokens: int = 0) -> bool:
    """``tokens`` = L (modalities · tokens-per-window) of the level asking;
    levels whose windows exceed the backward kernel's VMEM fit stay on the
    XLA path."""
    return (_TRAIN_FUSED and jax.default_backend() == "tpu"
            and (tokens == 0 or train_fits_vmem(tokens)))
