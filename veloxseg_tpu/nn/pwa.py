"""Paired Window Attention (PWA) — TPU-native formulation.

Reference behavior (``model/components/PWA.py``): each level runs attention
over a *pyramid* of (big, small) window pairs. Voxels are grouped into big
windows; each small window inside a big window is max-pooled to one token;
attention runs within each big window over its tokens (all modalities'
tokens concatenated → joint cross-modal attention); tokens are scattered
back to voxels by trilinear (align-corners) upsampling and the per-pair
outputs are concatenated along channels.

TPU-first design decisions:
- channels-last layout; gather/scatter are static reshape+transpose chains
  that XLA fuses (no gathers, no dynamic shapes);
- every pair has the same token count per window by construction
  (``PWA.py:135``), so all pairs stack on a single window axis and attention
  is ONE batched einsum per level → MXU;
- the align-corners upsample in scattering is a small static per-axis
  matmul (:func:`veloxseg_tpu.ops.resize.interp_matrix`);
- window layout, channel sizes and position-bias index tables are trace-time
  constants (:func:`veloxseg_tpu.core.windows.compute_window_layout`).
"""

from __future__ import annotations

import functools
import math
from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.windows import WindowLayout, compute_window_layout
from ..ops import pwa_attention
from . import pwa_packed
from ..ops.pwa_attention import (train_fused_enabled, window_attention,
                                 window_attention_train)
from ..ops.resize import interp_matrix
from .basic import DenseParams, DropPath, get_act
from .patch import PatchMerging


# ---------------------------------------------------------------------------
# Relative position bias (Swin-style, 3-D), static index table.
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _relative_position_index(window: Tuple[int, ...]) -> np.ndarray:
    """Flat (l, l) index into the (2t−1)-per-axis bias table.

    Matches ``attention_utils.PositionalEmbedding`` (``:73-118``).
    """
    axes = [np.arange(t) for t in window]
    coords = np.stack(np.meshgrid(*axes, indexing="ij"))  # (ndim, *window)
    flat = coords.reshape(len(window), -1)                # (ndim, l)
    rel = flat[:, :, None] - flat[:, None, :]             # (ndim, l, l)
    rel = np.moveaxis(rel, 0, -1)                         # (l, l, ndim)
    strides = []
    s = 1
    for t in reversed(window):
        strides.append(s)
        s *= 2 * t - 1
    strides = list(reversed(strides))
    idx = np.zeros(rel.shape[:2], dtype=np.int32)
    for a, t in enumerate(window):
        idx += (rel[..., a] + t - 1) * strides[a]
    return idx


class RelativePositionBias(nn.Module):
    """Learnable relative position bias table for one window shape."""

    window: Tuple[int, ...]
    num_heads: int

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        table_len = math.prod(2 * t - 1 for t in self.window)
        table = self.param(
            "table",
            nn.initializers.truncated_normal(stddev=0.02),
            (table_len, self.num_heads),
        )
        idx = _relative_position_index(tuple(self.window))
        l = idx.shape[0]
        bias = table[jnp.asarray(idx.reshape(-1))]
        # (l*l, heads) -> (heads, l, l)
        return bias.reshape(l, l, self.num_heads).transpose(2, 0, 1)


class _FFNParams(nn.Module):
    """Parameter-only stand-in for :class:`~veloxseg_tpu.nn.basic.FFN`
    (same nested Dense_0/Dense_1 names, shapes, init)."""

    hidden: int
    features: int

    @nn.compact
    def __call__(self):
        w1, b1 = DenseParams(self.hidden, self.features, name="Dense_0")()
        w2, b2 = DenseParams(self.features, self.hidden, name="Dense_1")()
        return w1, b1, w2, b2


class _LNParams(nn.Module):
    """Parameter-only stand-in for :class:`~veloxseg_tpu.nn.norms.LayerNorm`
    (same names/shapes/init) so modality-stacked execution can keep the
    reference-compatible per-modality parameter tree."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return scale, bias


def _layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                eps: float = 1e-6) -> jnp.ndarray:
    """Channel-axis LayerNorm with leading-axis-stacked scale/bias
    ((M, C) against (M, B, …, C)) — numerics identical to
    :class:`~veloxseg_tpu.nn.norms.LayerNorm`."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = ((xf - mean) / jnp.sqrt(var + eps)).astype(x.dtype)
    shape = (scale.shape[0],) + (1,) * (x.ndim - 2) + (scale.shape[-1],)
    return (y * scale.reshape(shape).astype(x.dtype)
            + bias.reshape(shape).astype(x.dtype))


# ---------------------------------------------------------------------------
# Window gather / scatter — pure static reshape pipelines.
# ---------------------------------------------------------------------------

def window_gather(x: jnp.ndarray, layout: WindowLayout,
                  c_per: int) -> jnp.ndarray:
    """(B, D, H, W, P·h·c) -> (B, h, ΣN_p, c, l) tokens.

    The channel axis of ``x`` factors as (pair, head, c) — pair slowest —
    matching the reference's ``(bswin head c)`` ordering (``PWA.py:111``).
    Each small window is max-pooled to one token (``PWA.py:127``).
    Channels land SECOND-minor (see ops/pwa_attention.py: a c-minor token
    tensor lane-pads up to 32× in HBM at the JL head widths).
    """
    b = x.shape[0]
    spatial = x.shape[1:4]
    heads = layout.num_heads
    tok = layout.tokens_per_axis
    xs = []
    for p in range(layout.num_pairs):
        small = layout.small_windows[p]
        grid = tuple(s // bw for s, bw in zip(spatial, layout.big_windows[p]))
        xi = x[..., p * heads * c_per:(p + 1) * heads * c_per]
        # (B, Nd, td, sd, Nh, th, sh, Nw, tw, sw, heads, c)
        xi = xi.reshape(
            b,
            grid[0], tok[0], small[0],
            grid[1], tok[1], small[1],
            grid[2], tok[2], small[2],
            heads, c_per)
        xi = xi.max(axis=(3, 6, 9))
        # -> (B, Nd, td, Nh, th, Nw, tw, heads, c)
        xi = xi.transpose(0, 7, 1, 3, 5, 8, 2, 4, 6)
        # -> (B, heads, Nd, Nh, Nw, c, td, th, tw)
        xi = xi.reshape(b, heads, math.prod(grid), c_per, math.prod(tok))
        xs.append(xi)
    return jnp.concatenate(xs, axis=2)


def window_scatter(tokens: jnp.ndarray, layout: WindowLayout,
                   c_per: int, spatial=None) -> jnp.ndarray:
    """(B, h, ΣN_p, c, l) tokens -> (B, D, H, W, P·h·c) voxels.

    Per pair: trilinear align-corners upsample of the per-window token grid
    back to big-window size (``PWA.py:190``), then inverse of the gather
    reshapes; pair outputs concatenate along channels. ``spatial`` is the
    runtime feature size (like the reference, the window pyramid comes from
    the configured input size but gathering follows the actual tensor —
    any divisible input works, e.g. sliding-window tiles of a different
    size than the training patch).
    """
    b, heads = tokens.shape[:2]
    if spatial is None:
        spatial = layout.input_size
    tok = layout.tokens_per_axis
    outs = []
    idx = 0
    for p in range(layout.num_pairs):
        small = layout.small_windows[p]
        grid = tuple(s // bw for s, bw in zip(spatial, layout.big_windows[p]))
        n = math.prod(grid)
        a = tokens[:, :, idx:idx + n]
        idx += n
        a = a.reshape(b, heads, *grid, c_per, *tok)
        # Per-window align-corners upsample along the token axes (6, 7, 8).
        for axis, (t, s) in enumerate(zip(tok, small)):
            if s == 1:
                continue
            w = interp_matrix(t, t * s, dtype=a.dtype)
            a = jnp.moveaxis(
                jnp.tensordot(w, a, axes=((1,), (6 + axis,)),
                              precision="highest"), 0, 6 + axis)
        # (B, heads, Nd, Nh, Nw, c, bd, bh, bw) ->
        # (B, Nd, bd, Nh, bh, Nw, bw, heads, c)
        a = a.transpose(0, 2, 6, 3, 7, 4, 8, 1, 5)
        a = a.reshape(b, *spatial, heads * c_per)
        outs.append(a)
    return jnp.concatenate(outs, axis=-1)


# ---------------------------------------------------------------------------
# Multimodal PWA attention + transformer blocks.
# ---------------------------------------------------------------------------

class MultiModalPWA(nn.Module):
    """Joint cross-modal paired-window attention.

    Per modality: LayerNorm → 1×1 q/k/v projections (JL down-projection to
    ``channels_qk``/``channels_v``); tokens of all modalities concatenate
    along the sequence axis inside each window; one attention einsum per
    level; per-modality scatter → 1×1 mix → dropout → residual
    (``PWA.py:246-379``).

    ``num_heads == 0`` bypasses attention entirely (``PWA.py:331``).
    """

    input_size: Tuple[int, ...]
    in_channels: Tuple[int, ...]
    min_big_window: Tuple[int, ...] = (3, 3, 3)
    min_small_window: Tuple[int, ...] = (1, 1, 1)
    scale_factor: int = 2
    num_heads: int = 1
    min_dim_head: int = 4
    qkv_bias: bool = True
    attn_drop: float = 0.1
    proj_drop: float = 0.1
    # xs are 2x2x2-packed parity-major streams (B, D/2, H/2, W/2, 8C);
    # voxel-side ops run in the packed layout (see nn/pwa_packed.py),
    # token tensors and parameters are identical to the unpacked path.
    packed: bool = False

    @property
    def layout(self) -> WindowLayout:
        return compute_window_layout(
            self.input_size, self.min_big_window, self.min_small_window,
            self.scale_factor, self.num_heads, self.min_dim_head,
            max(self.in_channels))

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray],
                 deterministic: bool) -> List[jnp.ndarray]:
        if self.num_heads == 0:
            return list(xs)
        m_count = len(self.in_channels)
        assert len(xs) == m_count
        layout = self.layout

        # TPU-shaped execution of the per-modality front end, two merges
        # deep (identical math, reference-compatible per-modality params):
        #
        # 1. joint q/k/v: the window gather (reshape → small-window
        #    maxpool → transpose) is per-channel, so projecting to a
        #    (pair, head, [q|k|v]) channel layout runs ONE gather instead
        #    of three;
        # 2. modality batching: all modalities stack on a leading axis —
        #    one LayerNorm, one batched qkv einsum, and (modality folded
        #    into batch) one gather — instead of M copies of each op.
        heads = layout.num_heads
        pairs = layout.num_pairs
        dqk, dv = layout.dim_qk, layout.dim_v
        cj = 2 * dqk + dv
        wjs, bjs, scales, shifts = [], [], [], []
        cin = xs[0].shape[-1] // 8 if self.packed else xs[0].shape[-1]
        for m in range(m_count):
            s, t = _LNParams(cin, name=f"norm_{m}")()
            scales.append(s)
            shifts.append(t)
            wq, bq = DenseParams(layout.channels_qk, cin,
                                 self.qkv_bias, name=f"q_{m}")()
            wk, bk = DenseParams(layout.channels_qk, cin,
                                 self.qkv_bias, name=f"k_{m}")()
            wv, bv = DenseParams(layout.channels_v, cin,
                                 self.qkv_bias, name=f"v_{m}")()
            wjs.append(jnp.concatenate(
                [wq.reshape(cin, pairs, heads, dqk),
                 wk.reshape(cin, pairs, heads, dqk),
                 wv.reshape(cin, pairs, heads, dv)], axis=-1
            ).reshape(cin, pairs * heads * cj))
            if self.qkv_bias:
                bjs.append(jnp.concatenate(
                    [bq.reshape(pairs, heads, dqk),
                     bk.reshape(pairs, heads, dqk),
                     bv.reshape(pairs, heads, dv)], axis=-1).reshape(-1))

        x = jnp.stack(xs, axis=0)             # (M, B, D, H, W, C) voxels
        bshape = (m_count, 1, 1, 1, 1, -1)    # or (..., D/2, ..., 8C) packed
        if self.packed:
            h = pwa_packed.seg_layer_norm(x, 8)
            sc = pwa_packed.tile8(jnp.stack(scales)).reshape(bshape)
            sh = pwa_packed.tile8(jnp.stack(shifts)).reshape(bshape)
            h = h * sc.astype(h.dtype) + sh.astype(h.dtype)
            wq = jnp.stack([pwa_packed.qkv_parity(w, pairs) for w in wjs])
        else:
            h = _layer_norm(x, jnp.stack(scales), jnp.stack(shifts))
            wq = jnp.stack(wjs)
        y = jnp.einsum("m...c,mcj->m...j", h, wq.astype(h.dtype))
        if self.qkv_bias:
            if self.packed:
                bj = jnp.stack([pwa_packed.qkv_bias_tile(bb, pairs)
                                for bb in bjs]).reshape(bshape)
            else:
                bj = jnp.stack(bjs).reshape(bshape)
            y = y + bj.astype(y.dtype)
        b = y.shape[1]
        if self.packed:
            tok = pwa_packed.window_gather_packed(
                y.reshape(m_count * b, *y.shape[2:]), layout, cj)
        else:
            tok = window_gather(y.reshape(m_count * b, *y.shape[2:]),
                                layout, cj)          # (M·B, h, N, cj, l)
        mb, hh, n, _, l = tok.shape
        # (M, B, h, N, c, l) → (B, h, N, c, M·l): per-window token axis is
        # the modality concatenation (reference ``PWA.py:338-370``)
        tok = tok.reshape(m_count, b, hh, n, cj, l)
        tok = tok.transpose(1, 2, 3, 4, 0, 5).reshape(b, hh, n, cj,
                                                      m_count * l)
        q = tok[..., :dqk, :]
        k = tok[..., dqk:2 * dqk, :]
        v = tok[..., 2 * dqk:, :]

        scale = 1.0 / math.sqrt(layout.dim_qk)

        # Same per-window bias added to every (modality_i, modality_j) block
        # (``PWA.py:316-320``) — equivalent to tiling it M×M.
        bias = RelativePositionBias(
            window=layout.tokens_per_axis, num_heads=self.num_heads,
            name="pos_bias")()
        bias = jnp.tile(bias, (1, m_count, m_count))

        mesh = pwa_attention.spmd_mesh()
        if mesh is not None and q.shape[0] % mesh.shape["data"] != 0:
            mesh = None  # uneven batch: stay on the GSPMD-partitionable path
        if deterministic:
            # Fused Pallas attention (score→bias→softmax→·V in VMEM, no
            # HBM score/weight tensors); einsum fallback off-TPU. Under a
            # mesh, shard_map over the batch axis (windows are
            # embarrassingly parallel) — GSPMD can't split the custom call.
            if mesh is not None and pwa_attention.eval_fits_vmem(
                    q.shape[-1]):
                from jax.sharding import PartitionSpec as P
                attn = jax.shard_map(
                    functools.partial(window_attention, scale=scale),
                    mesh=mesh,
                    in_specs=(P("data"), P("data"), P("data"), P()),
                    out_specs=P("data"), check_vma=False,
                )(q, k, v, bias)
            else:
                attn = window_attention(q, k, v, bias, scale)
        elif train_fused_enabled(m_count * layout.tokens_per_window):
            # Fused train kernel: in-kernel counter-based weight dropout +
            # custom VJP (backward recomputes softmax — no saved weights).
            seed = jax.random.randint(
                self.make_rng("dropout"), (1, 1), 0, 2**31 - 1,
                dtype=jnp.int32)
            interp = pwa_attention.force_interpret()
            drop = float(self.attn_drop)
            if mesh is None:
                seed_info = jnp.concatenate(
                    [seed, jnp.zeros((1, 1), jnp.int32)], axis=1)
                attn = window_attention_train(
                    q, k, v, bias, seed_info, scale, drop, interp)
            else:
                from jax.sharding import PartitionSpec as P
                b_local = q.shape[0] // mesh.shape["data"]

                def _body(q, k, v, bias, seed):
                    # global batch offset → dropout mask bit-identical to
                    # the unsharded run (see window_attention_train docs)
                    off = (jax.lax.axis_index("data").astype(jnp.int32)
                           * b_local)
                    seed_info = jnp.concatenate(
                        [seed, off[None, None]], axis=1)
                    return window_attention_train(
                        q, k, v, bias, seed_info, scale, drop, interp)

                attn = jax.shard_map(
                    _body, mesh=mesh,
                    in_specs=(P("data"), P("data"), P("data"), P(), P()),
                    out_specs=P("data"), check_vma=False,
                )(q, k, v, bias, seed)
        else:
            scores = jnp.einsum(
                "bhncl,bhncm->bhnlm", q, k,
                preferred_element_type=jnp.float32) * scale
            scores = scores + bias[None, :, None]
            weights = nn.softmax(scores, axis=-1)
            weights = nn.Dropout(self.attn_drop)(
                weights, deterministic=deterministic)
            attn = jnp.einsum(
                "bhnlm,bhncm->bhncl", weights.astype(v.dtype), v,
                preferred_element_type=jnp.float32).astype(v.dtype)

        l = layout.tokens_per_window
        spatial = xs[0].shape[1:4]
        # (B, h, N, c, M·l) → (M·B, h, N, c, l): one scatter for all
        # modalities, then a batched mix projection.
        am = attn.reshape(b, hh, n, layout.dim_v, m_count, l)
        am = am.transpose(4, 0, 1, 2, 3, 5).reshape(
            m_count * b, hh, n, layout.dim_v, l)
        cmix = pairs * heads * layout.dim_v
        mix_w, mix_b = [], []
        for m in range(m_count):
            w, bb = DenseParams(self.in_channels[m], cmix,
                                name=f"mix_{m}")()
            mix_w.append(w)
            mix_b.append(bb)
        if self.packed:
            am = pwa_packed.window_scatter_packed(
                am, layout, layout.dim_v,
                tuple(2 * s for s in spatial))
            wm = jnp.stack([pwa_packed.mix_parity(w, pairs)
                            for w in mix_w])
            bm = jnp.stack([pwa_packed.tile8(bb) for bb in mix_b])
        else:
            am = window_scatter(am, layout, layout.dim_v, spatial)
            wm = jnp.stack(mix_w)
            bm = jnp.stack(mix_b)
        am = am.reshape(m_count, b, *am.shape[1:])
        am = jnp.einsum("m...c,mce->m...e", am, wm.astype(am.dtype))
        am = am + bm.reshape(bshape).astype(am.dtype)
        am = nn.Dropout(self.proj_drop)(am, deterministic=deterministic)
        return [xs[m] + am[m] for m in range(m_count)]


class PWABlock(nn.Module):
    """Transformer block: MM-PWA (+DropPath residual) then per-modality FFN.

    Reference ``Paired_Windows_TransformerBlock`` (``PWA.py:382-439``) —
    including its double residual: the attention output already contains
    ``x + proj(attn)`` and the block adds ``x`` again.
    """

    input_size: Tuple[int, ...]
    in_channels: Tuple[int, ...]
    min_big_window: Tuple[int, ...]
    min_small_window: Tuple[int, ...]
    scale_factor: int = 2
    num_heads: int = 1
    min_dim_head: int = 4
    attn_drop: float = 0.1
    proj_drop: float = 0.1
    drop_path: float = 0.0
    ffn_expansion_ratio: int = 4
    act_layer: str = "GELU"
    qkv_bias: bool = True
    packed: bool = False

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray],
                 deterministic: bool) -> List[jnp.ndarray]:
        m_count = len(self.in_channels)
        attns = MultiModalPWA(
            input_size=self.input_size,
            in_channels=tuple(self.in_channels),
            min_big_window=self.min_big_window,
            min_small_window=self.min_small_window,
            scale_factor=self.scale_factor,
            num_heads=self.num_heads,
            min_dim_head=self.min_dim_head,
            qkv_bias=self.qkv_bias,
            attn_drop=self.attn_drop,
            proj_drop=self.proj_drop,
            packed=self.packed,
            name="attn",
        )(xs, deterministic)
        dp = DropPath(self.drop_path)
        ys = [xs[m] + dp(attns[m], deterministic) for m in range(m_count)]
        # modality-stacked LN + FFN (one batched einsum per matmul instead
        # of M narrow ones; params stay per-modality — see MultiModalPWA)
        c = self.in_channels[0]
        hidden = c * self.ffn_expansion_ratio
        scales, shifts, w1s, b1s, w2s, b2s = [], [], [], [], [], []
        for m in range(m_count):
            s, t = _LNParams(c, name=f"ffn_norm_{m}")()
            scales.append(s)
            shifts.append(t)
            w1, b1, w2, b2 = _FFNParams(hidden, c, name=f"ffn_{m}")()
            w1s.append(w1)
            b1s.append(b1)
            w2s.append(w2)
            b2s.append(b2)
        zs = jnp.stack(ys)
        mshape = (m_count,) + (1,) * (zs.ndim - 2) + (-1,)
        if self.packed:
            z = pwa_packed.seg_layer_norm(zs, 8)
            sc = pwa_packed.tile8(jnp.stack(scales)).reshape(mshape)
            sh = pwa_packed.tile8(jnp.stack(shifts)).reshape(mshape)
            z = z * sc.astype(z.dtype) + sh.astype(z.dtype)
            w1q = jnp.stack([pwa_packed.dense_parity(w) for w in w1s])
            w2q = jnp.stack([pwa_packed.dense_parity(w) for w in w2s])
            b1q = pwa_packed.tile8(jnp.stack(b1s)).reshape(mshape)
            b2q = pwa_packed.tile8(jnp.stack(b2s)).reshape(mshape)
        else:
            z = _layer_norm(zs, jnp.stack(scales), jnp.stack(shifts))
            w1q = jnp.stack(w1s)
            w2q = jnp.stack(w2s)
            b1q = jnp.stack(b1s).reshape(mshape)
            b2q = jnp.stack(b2s).reshape(mshape)
        act = get_act(self.act_layer)
        z = jnp.einsum("m...c,mce->m...e", z, w1q.astype(z.dtype))
        z = act(z + b1q.astype(z.dtype))
        drop = nn.Dropout(self.proj_drop)
        z = drop(z, deterministic=deterministic)
        z = jnp.einsum("m...c,mce->m...e", z, w2q.astype(z.dtype))
        z = z + b2q.astype(z.dtype)
        z = drop(z, deterministic=deterministic)
        return [ys[m] + dp(z[m], deterministic) for m in range(m_count)]


class TransformerStage(nn.Module):
    """``depth`` PWA blocks + optional per-modality PatchMerging downsample.

    Reference ``Transformer_BasicLayer`` (``PWA.py:444-511``).
    """

    input_size: Tuple[int, ...]
    in_channels: Tuple[int, ...]
    depth: int = 2
    min_big_window: Tuple[int, ...] = (3, 3, 3)
    min_small_window: Tuple[int, ...] = (1, 1, 1)
    scale_factor: int = 2
    num_heads: int = 1
    min_dim_head: int = 4
    attn_drop: float = 0.1
    proj_drop: float = 0.1
    drop_path: Tuple[float, ...] = (0.0,)
    ffn_expansion_ratio: int = 4
    act_layer: str = "GELU"
    qkv_bias: bool = True
    do_downsample: bool = True
    packed: bool = False        # this stage's streams are packed
    down_packed: bool = False   # emit the downsampled stream packed

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], deterministic: bool):
        dp = self.drop_path
        if not isinstance(dp, (tuple, list)):
            dp = (dp,) * self.depth
        for i in range(self.depth):
            xs = PWABlock(
                input_size=self.input_size,
                in_channels=tuple(self.in_channels),
                min_big_window=self.min_big_window,
                min_small_window=self.min_small_window,
                scale_factor=self.scale_factor,
                num_heads=self.num_heads,
                min_dim_head=self.min_dim_head,
                attn_drop=self.attn_drop,
                proj_drop=self.proj_drop,
                drop_path=dp[i],
                ffn_expansion_ratio=self.ffn_expansion_ratio,
                act_layer=self.act_layer,
                qkv_bias=self.qkv_bias,
                packed=self.packed,
                name=f"block_{i}",
            )(xs, deterministic)
        down = None
        if self.do_downsample:
            down = [PatchMerging(packed_in=self.packed,
                                 packed_out=self.down_packed,
                                 name=f"down_{m}")(xs[m])
                    for m in range(len(self.in_channels))]
        return list(xs), down
