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
from ..ops.pwa_attention import (train_fused_enabled, window_attention,
                                 window_attention_train)
from ..ops.resize import interp_matrix
from .basic import DropPath, FFN, he_normal
from .norms import LayerNorm
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


# ---------------------------------------------------------------------------
# Window gather / scatter — pure static reshape pipelines.
# ---------------------------------------------------------------------------

def window_gather(x: jnp.ndarray, layout: WindowLayout,
                  c_per: int) -> jnp.ndarray:
    """(B, D, H, W, P·h·c) -> (B, h, ΣN_p, l, c) tokens.

    The channel axis of ``x`` factors as (pair, head, c) — pair slowest —
    matching the reference's ``(bswin head c)`` ordering (``PWA.py:111``).
    Each small window is max-pooled to one token (``PWA.py:127``).
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
        xi = xi.transpose(0, 7, 1, 3, 5, 2, 4, 6, 8)
        # -> (B, heads, Nd, Nh, Nw, td, th, tw, c)
        xi = xi.reshape(b, heads, math.prod(grid), math.prod(tok), c_per)
        xs.append(xi)
    return jnp.concatenate(xs, axis=2)


def window_scatter(tokens: jnp.ndarray, layout: WindowLayout,
                   c_per: int, spatial=None) -> jnp.ndarray:
    """(B, h, ΣN_p, l, c) tokens -> (B, D, H, W, P·h·c) voxels.

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
        a = a.reshape(b, heads, *grid, *tok, c_per)
        # Per-window align-corners upsample along the token axes (5, 6, 7).
        for axis, (t, s) in enumerate(zip(tok, small)):
            if s == 1:
                continue
            w = interp_matrix(t, t * s, dtype=a.dtype)
            a = jnp.moveaxis(
                jnp.tensordot(w, a, axes=((1,), (5 + axis,)),
                              precision="highest"), 0, 5 + axis)
        # (B, heads, Nd, Nh, Nw, bd, bh, bw, c) ->
        # (B, Nd, bd, Nh, bh, Nw, bw, heads, c)
        a = a.transpose(0, 2, 5, 3, 6, 4, 7, 1, 8)
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

        qs, ks, vs = [], [], []
        for m in range(m_count):
            h = LayerNorm(name=f"norm_{m}")(xs[m])
            q = nn.Dense(layout.channels_qk, use_bias=self.qkv_bias,
                         kernel_init=he_normal, name=f"q_{m}")(h)
            k = nn.Dense(layout.channels_qk, use_bias=self.qkv_bias,
                         kernel_init=he_normal, name=f"k_{m}")(h)
            v = nn.Dense(layout.channels_v, use_bias=self.qkv_bias,
                         kernel_init=he_normal, name=f"v_{m}")(h)
            qs.append(window_gather(q, layout, layout.dim_qk))
            ks.append(window_gather(k, layout, layout.dim_qk))
            vs.append(window_gather(v, layout, layout.dim_v))

        # (B, heads, N, M·l, c)
        q = jnp.concatenate(qs, axis=3)
        k = jnp.concatenate(ks, axis=3)
        v = jnp.concatenate(vs, axis=3)

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
                    q.shape[-2]):
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
                "bhnlc,bhnmc->bhnlm", q, k,
                preferred_element_type=jnp.float32) * scale
            scores = scores + bias[None, :, None]
            weights = nn.softmax(scores, axis=-1)
            weights = nn.Dropout(self.attn_drop)(
                weights, deterministic=deterministic)
            attn = jnp.einsum(
                "bhnlm,bhnmc->bhnlc", weights.astype(v.dtype), v,
                preferred_element_type=jnp.float32).astype(v.dtype)

        l = layout.tokens_per_window
        spatial = xs[0].shape[1:4]
        outs = []
        for m in range(m_count):
            am = attn[:, :, :, m * l:(m + 1) * l]
            am = window_scatter(am, layout, layout.dim_v, spatial)
            am = nn.Dense(self.in_channels[m], kernel_init=he_normal,
                          name=f"mix_{m}")(am)
            am = nn.Dropout(self.proj_drop)(am, deterministic=deterministic)
            outs.append(xs[m] + am)
        return outs


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
            name="attn",
        )(xs, deterministic)
        dp = DropPath(self.drop_path)
        ys = [xs[m] + dp(attns[m], deterministic) for m in range(m_count)]
        outs = []
        for m in range(m_count):
            z = LayerNorm(name=f"ffn_norm_{m}")(ys[m])
            z = FFN(expansion_ratio=self.ffn_expansion_ratio,
                    dropout_rate=self.proj_drop, act=self.act_layer,
                    name=f"ffn_{m}")(z, deterministic)
            outs.append(ys[m] + dp(z, deterministic))
        return outs


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
                name=f"block_{i}",
            )(xs, deterministic)
        down = None
        if self.do_downsample:
            down = [PatchMerging(name=f"down_{m}")(xs[m])
                    for m in range(len(self.in_channels))]
        return list(xs), down
