"""Dual-branch encoder (Modal-Fusion conv + Modal-Cooperative transformer).

Reference: ``model/Encoder.py``. Channels-last throughout.

Both branches execute on 2×2×2-packed parity-major streams wherever the
level's geometry allows it (conv: ``ops/packed_conv.py``; attention:
``nn/pwa_packed.py``) — the packed minor dim (8·C ≥ 128) eliminates the
TPU lane padding that made the small-channel voxel tensors the dominant
HBM traffic of the train step (PERF_NOTES round 5). Parameters and math
are identical to the unpacked path.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..core.windows import compute_window_layout
from ..ops import packed_conv
from . import pwa_packed
from .basic import DenseParams, he_normal
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
    """Per-modality PWA pyramid (``model/Encoder.py:88-204``).

    With ``packed_out=True`` the call returns ``(feats, flags)`` where
    ``flags[i]`` says whether level i's per-modality features are
    2×2×2-packed parity-major streams; internally every level whose
    window pyramid aligns with 2× packing runs fully packed (embedding,
    attention voxel ops, FFN, merging — see ``nn/pwa_packed.py``).
    """

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
    packed_out: bool = False

    def _packed_flags(self, rt0) -> List[bool]:
        """Per-level packed-execution eligibility. Window geometry comes
        from the CONFIGURED size (like the layouts themselves); evenness
        is checked on the RUNTIME grid so sliding-window tiles of other
        shapes stay correct (fall back to unpacked)."""
        size_cfg = tuple(s // self.patch_size for s in self.input_size)
        flags = []
        for i in range(len(self.depths)):
            rt = tuple(s // 2 ** i for s in rt0)
            cfg_i = tuple(s // 2 ** i for s in size_cfg)
            if self.num_heads[i] > 0:
                layout = compute_window_layout(
                    cfg_i, tuple(self.min_big_window_sizes[i]),
                    tuple(self.min_small_window_sizes[i]),
                    self.scale_factors[i], self.num_heads[i],
                    self.min_dim_head[i], int(self.embed_dim * 2 ** i))
                flags.append(pwa_packed.packable(layout, rt))
            else:
                flags.append(pwa_packed.enabled()
                             and all(s % 2 == 0 for s in rt))
        return flags

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], deterministic: bool):
        m_count = len(self.in_channels)
        num_layers = len(self.depths)
        rt0 = tuple(s // self.patch_size for s in xs[0].shape[1:4])
        flags = self._packed_flags(rt0)

        xs = [PatchEmbed(embed_dim=self.embed_dim,
                         patch_size=self.patch_size,
                         use_norm=self.patch_norm,
                         packed_out=flags[0],
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
                packed=flags[i],
                down_packed=flags[i + 1] if i + 1 < num_layers else False,
                name=f"stage_{i}",
            )(xs, deterministic)
            feats.append(xs)
            if down is not None:
                xs = down
            size = tuple(s // 2 for s in size)
        if self.packed_out:
            return feats, flags
        feats = [[packed_conv.unpack_s2d(f, int(self.embed_dim * 2 ** i))
                  if flags[i] else f for f in level]
                 for i, level in enumerate(feats)]
        return feats  # list over levels, each a list over modalities


class Encoder(nn.Module):
    """Fused dual-stream encoder (``model/Encoder.py:207-367``).

    Returns ``(attn_feats, enc_feats, attn_packed, enc_packed)`` where
    ``attn_feats`` is the raw per-modality attention pyramid (teacher
    input for SDKT), ``enc_feats`` the fused conv features, and the two
    flag lists say which levels are 2×2×2-packed parity-major streams.
    Callers in eval mode simply ignore ``attn_feats`` — under ``jit`` the
    unused branch is dead-code eliminated, mirroring the reference's
    training-only return (``model/Encoder.py:364-367``) without
    Python-level branching.
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

        attn_feats, attn_packed = TransformerEncoder(
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
            packed_out=True,
            name="encoder_attn",
        )(xs, deterministic)

        num_levels = len(self.conv_depths)
        c = self.base_ch
        groups = [c * 2 ** i // self.min_dim_group[i]
                  for i in range(num_levels)]
        h = x
        # conv level i grid = input / (patch · 2^i); packable iff even
        grid0 = tuple(s // self.patch_size for s in x.shape[1:4])
        conv_ok = (packed_conv.enabled() and max(self.kernel_sizes) <= 5
                   and all(k % 2 == 1 for k in self.kernel_sizes))
        enc_packed = [
            conv_ok and all((g // 2 ** i) % 2 == 0 and g % 2 ** i == 0
                            for g in grid0)
            for i in range(num_levels)
        ]

        # Modal mixers: concat modality features → 1×1 conv + IN
        # (``model/Encoder.py:334-337``), emitted in the layout the conv
        # level consumes (packed where the level is packed).
        ca_all = [self.attn_base_ch * 2 ** i for i in range(num_levels)]
        mixed = []
        for i in range(num_levels):
            ci = self.base_ch * 2 ** i
            ca = ca_all[i]
            cat = jnp.concatenate(attn_feats[i], axis=-1)
            if attn_packed[i]:
                kern, bias = DenseParams(ci, m_count * ca,
                                         name=f"attn2conv_{i + 1}")()
                big = pwa_packed.concat_parity(kern, [ca] * m_count)
                y = cat @ big.astype(cat.dtype)
                y = y + pwa_packed.tile8(bias).astype(y.dtype)
                y = packed_conv.instance_norm_packed(y, ci)
                if not enc_packed[i]:
                    y = packed_conv.unpack_s2d(y, ci)
            else:
                y = nn.Dense(ci, kernel_init=he_normal,
                             name=f"attn2conv_{i + 1}")(cat)
                y = InstanceNorm()(y)
                if enc_packed[i]:
                    y = packed_conv.pack_s2d(y)
            mixed.append(y)

        # Interleaved conv pyramid with per-level attention fusion
        # (``model/Encoder.py:351-361``). Packed levels run end-to-end in
        # the packed stream (DownConv emits packed, mixer add, packed-io
        # JLC) and stay packed for the decoders.
        enc_feats = []
        for i in range(num_levels):
            p = self.patch_size if i == 0 else 2
            ci = c * 2 ** i
            if enc_packed[i]:
                if i > 0 and enc_packed[i - 1]:
                    # previous level is packed: its packed grid is this
                    # level's voxel grid, so the strided DownConv reads
                    # the unpacked view (one block transpose)
                    h_in = packed_conv.unpack_s2d(h, c * 2 ** (i - 1))
                else:
                    h_in = h
                hp = DownConv(ci, patch_size=p, packed_out=True,
                              name=f"conv_down{i + 1}")(h_in)
                hp = hp + mixed[i]
                hp = JLCLayer(depth=self.conv_depths[i],
                              kernel_sizes=self.kernel_sizes,
                              groups=groups[i],
                              expansion_factor=self.conv_expansion_factor[i],
                              dropout=self.conv_drop, packed_io=True,
                              name=f"conv_layer{i + 1}")(hp, deterministic)
                h = hp
            else:
                if i > 0 and enc_packed[i - 1]:
                    h = packed_conv.unpack_s2d(h, c * 2 ** (i - 1))
                h = DownConv(ci, patch_size=p,
                             name=f"conv_down{i + 1}")(h) + mixed[i]
                h = JLCLayer(depth=self.conv_depths[i],
                             kernel_sizes=self.kernel_sizes,
                             groups=groups[i],
                             expansion_factor=self.conv_expansion_factor[i],
                             dropout=self.conv_drop,
                             name=f"conv_layer{i + 1}")(h, deterministic)
            enc_feats.append(h)

        return attn_feats, tuple(enc_feats), attn_packed, enc_packed
