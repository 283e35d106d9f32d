"""Dual-branch encoder (Modal-Fusion conv + Modal-Cooperative transformer).

Reference: ``model/Encoder.py``. Channels-last throughout.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops import packed_conv
from .basic import he_normal
from .conv_blocks import DownConv, JLCLayer
from .norms import InstanceNorm
from .patch import PatchEmbed
from .pwa import TransformerStage


class ConvEncoder(nn.Module):
    """4-level JLC pyramid (``model/Encoder.py:13-85``).

    Exposes per-level ``down``/``layer`` submodules so the fused
    :class:`Encoder` can interleave them with attention features exactly as
    the reference does (``model/Encoder.py:351-361``).
    """

    patch_size: int = 4
    base_ch: int = 16
    depths: Tuple[int, ...] = (1, 1, 1, 1)
    kernel_sizes: Tuple[int, ...] = (1, 3, 5)
    min_dim_group: Tuple[int, ...] = (4, 8, 8, 16)
    expansion_factor: Tuple[int, ...] = (3, 3, 2, 2)
    dropout: float = 0.0

    def setup(self):
        c = self.base_ch
        n = len(self.depths)
        self.downs = [
            DownConv(c * 2 ** i,
                     patch_size=self.patch_size if i == 0 else 2,
                     name=f"down{i + 1}")
            for i in range(n)
        ]
        groups = [c * 2 ** i // self.min_dim_group[i] for i in range(n)]
        self.layers = [
            JLCLayer(depth=self.depths[i], kernel_sizes=self.kernel_sizes,
                     groups=groups[i],
                     expansion_factor=self.expansion_factor[i],
                     dropout=self.dropout, name=f"layer{i + 1}")
            for i in range(n)
        ]

    def __call__(self, x: jnp.ndarray, deterministic: bool):
        encs = []
        for down, layer in zip(self.downs, self.layers):
            x = layer(down(x), deterministic)
            encs.append(x)
        return tuple(encs)


class TransformerEncoder(nn.Module):
    """Per-modality PWA pyramid (``model/Encoder.py:88-204``)."""

    input_size: Tuple[int, ...]
    patch_size: int
    in_channels: Tuple[int, ...]
    embed_dim: int = 16
    depths: Tuple[int, ...] = (2, 2, 2, 2)
    min_big_window_sizes: Tuple[Tuple[int, ...], ...] = (
        (3, 3, 3), (6, 6, 6), (3, 3, 3), (3, 3, 3))
    min_small_window_sizes: Tuple[Tuple[int, ...], ...] = (
        (1, 1, 1), (1, 1, 1), (1, 1, 1), (1, 1, 1))
    scale_factors: Tuple[int, ...] = (2, 2, 2, 2)
    num_heads: Tuple[int, ...] = (1, 2, 2, 4)
    min_dim_head: Tuple[int, ...] = (4, 8, 8, 16)
    ffn_expansion_ratio: Tuple[int, ...] = (3, 3, 2, 2)
    attn_drop: float = 0.1
    proj_drop: float = 0.1
    drop_path: float = 0.0
    act_layer: str = "GELU"
    patch_norm: bool = False
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], deterministic: bool):
        m_count = len(self.in_channels)
        num_layers = len(self.depths)
        xs = [PatchEmbed(embed_dim=self.embed_dim,
                         patch_size=self.patch_size,
                         use_norm=self.patch_norm,
                         name=f"patch_embed_{m}")(xs[m])
              for m in range(m_count)]
        drop = nn.Dropout(self.proj_drop)
        xs = [drop(x, deterministic=deterministic) for x in xs]

        # Stochastic-depth schedule over the whole pyramid
        # (``model/Encoder.py:161``).
        dpr = np.linspace(0.0, self.drop_path, sum(self.depths)).tolist()

        size = tuple(s // self.patch_size for s in self.input_size)
        feats = []
        for i in range(num_layers):
            start = sum(self.depths[:i])
            stage_dp = tuple(dpr[start:start + self.depths[i]])
            xs, down = TransformerStage(
                input_size=size,
                in_channels=(int(self.embed_dim * 2 ** i),) * m_count,
                depth=self.depths[i],
                min_big_window=tuple(self.min_big_window_sizes[i]),
                min_small_window=tuple(self.min_small_window_sizes[i]),
                scale_factor=self.scale_factors[i],
                num_heads=self.num_heads[i],
                min_dim_head=self.min_dim_head[i],
                attn_drop=self.attn_drop,
                proj_drop=self.proj_drop,
                drop_path=stage_dp,
                ffn_expansion_ratio=self.ffn_expansion_ratio[i],
                act_layer=self.act_layer,
                qkv_bias=self.qkv_bias,
                do_downsample=i < num_layers - 1,
                name=f"stage_{i}",
            )(xs, deterministic)
            feats.append(xs)
            if down is not None:
                xs = down
            size = tuple(s // 2 for s in size)
        return feats  # list over levels, each a list over modalities


class Encoder(nn.Module):
    """Fused dual-stream encoder (``model/Encoder.py:207-367``).

    Returns ``(attn_feats, enc_feats)`` where ``attn_feats`` is the raw
    per-modality attention pyramid (teacher input for SDKT) and
    ``enc_feats`` the fused conv features. Callers in eval mode simply
    ignore ``attn_feats`` — under ``jit`` the unused branch is dead-code
    eliminated, mirroring the reference's training-only return
    (``model/Encoder.py:364-367``) without Python-level branching.
    """

    input_size: Tuple[int, ...]
    patch_size: int
    in_ch: Tuple[int, ...]
    base_ch: int = 16
    conv_depths: Tuple[int, ...] = (1, 1, 1, 1)
    kernel_sizes: Tuple[int, ...] = (1, 3, 5)
    min_dim_group: Tuple[int, ...] = (4, 8, 8, 16)
    conv_expansion_factor: Tuple[int, ...] = (3, 3, 2, 2)
    attn_base_ch: int = 16
    depths: Tuple[int, ...] = (2, 2, 2, 2)
    min_big_window_sizes: Tuple[Tuple[int, ...], ...] = (
        (3, 3, 3), (6, 6, 6), (3, 3, 3), (3, 3, 3))
    min_small_window_sizes: Tuple[Tuple[int, ...], ...] = (
        (1, 1, 1), (1, 1, 1), (1, 1, 1), (1, 1, 1))
    min_dim_head: Tuple[int, ...] = (4, 8, 8, 16)
    scale_factors: Tuple[int, ...] = (2, 2, 2, 2)
    num_heads: Tuple[int, ...] = (1, 2, 2, 4)
    attn_drop: float = 0.1
    proj_drop: float = 0.1
    drop_path: float = 0.0
    ffn_expansion_ratio: Tuple[int, ...] = (3, 3, 2, 2)
    act_layer: str = "GELU"
    patch_norm: bool = False
    qkv_bias: bool = True
    conv_drop: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool):
        m_count = len(self.in_ch)

        # Split fused input into modalities along channels.
        xs = []
        c0 = 0
        for c in self.in_ch:
            xs.append(x[..., c0:c0 + c])
            c0 += c

        attn_feats = TransformerEncoder(
            input_size=self.input_size,
            patch_size=self.patch_size,
            in_channels=tuple(self.in_ch),
            embed_dim=self.attn_base_ch,
            depths=self.depths,
            min_big_window_sizes=self.min_big_window_sizes,
            min_small_window_sizes=self.min_small_window_sizes,
            scale_factors=self.scale_factors,
            num_heads=self.num_heads,
            min_dim_head=self.min_dim_head,
            ffn_expansion_ratio=self.ffn_expansion_ratio,
            attn_drop=self.attn_drop,
            proj_drop=self.proj_drop,
            drop_path=self.drop_path,
            act_layer=self.act_layer,
            patch_norm=self.patch_norm,
            qkv_bias=self.qkv_bias,
            name="encoder_attn",
        )(xs, deterministic)

        # Modal mixers: concat modality features → 1×1 conv + IN
        # (``model/Encoder.py:334-337``).
        num_levels = len(self.conv_depths)
        mixed = []
        for i in range(num_levels):
            cat = jnp.concatenate(attn_feats[i], axis=-1)
            y = nn.Dense(self.base_ch * 2 ** i, kernel_init=he_normal,
                         name=f"attn2conv_{i + 1}")(cat)
            mixed.append(InstanceNorm()(y))

        # Interleaved conv pyramid with per-level attention fusion
        # (``model/Encoder.py:351-361``). Where the level's grid allows
        # it, the whole level runs as a packed (space-to-depth) stream:
        # DownConv emits packed, the mixer is packed once, the JLC layer
        # does packed-io, and the level output unpacks once at the end —
        # the minimum number of layout transposes for the level.
        c = self.base_ch
        groups = [c * 2 ** i // self.min_dim_group[i]
                  for i in range(num_levels)]
        enc_feats = []
        h = x
        for i in range(num_levels):
            p = self.patch_size if i == 0 else 2
            ci = c * 2 ** i
            use_packed = (packed_conv.enabled()
                          and max(self.kernel_sizes) <= 5
                          and all(k % 2 == 1 for k in self.kernel_sizes)
                          and all(s % (2 * p) == 0 for s in h.shape[1:4]))
            if use_packed:
                hp = DownConv(ci, patch_size=p, packed_out=True,
                              name=f"conv_down{i + 1}")(h)
                hp = hp + packed_conv.pack_s2d(mixed[i])
                hp = JLCLayer(depth=self.conv_depths[i],
                              kernel_sizes=self.kernel_sizes,
                              groups=groups[i],
                              expansion_factor=self.conv_expansion_factor[i],
                              dropout=self.conv_drop, packed_io=True,
                              name=f"conv_layer{i + 1}")(hp, deterministic)
                h = packed_conv.unpack_s2d(hp, ci)
            else:
                h = DownConv(ci, patch_size=p,
                             name=f"conv_down{i + 1}")(h) + mixed[i]
                h = JLCLayer(depth=self.conv_depths[i],
                             kernel_sizes=self.kernel_sizes,
                             groups=groups[i],
                             expansion_factor=self.conv_expansion_factor[i],
                             dropout=self.conv_drop,
                             name=f"conv_layer{i + 1}")(h, deterministic)
            enc_feats.append(h)

        return attn_feats, tuple(enc_feats)
