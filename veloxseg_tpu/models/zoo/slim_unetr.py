"""SlimUNETR baseline.

Reference: ``compared_model/SlimUNETR`` — non-overlapping strided-conv
encoder (r=4,2,2,2 with GroupNorm(1) = LayerNorm-over-all), Slim blocks
(depthwise positional conv, BN+pointwise local congregation, 1×1 MLPs,
sparse-sampled global attention + transposed-conv reverse diffusion),
learned position embedding at the bottleneck, mirrored decoder with
additive skips, transposed-conv seg head.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...nn.basic import he_normal
from ..registry import register_model
from .common import (BatchNormNoTrack, Conv3d, ConvTranspose3d, GroupNorm,
                     avg_pool3d)


class SlimBlock(nn.Module):
    channels: int
    r: int
    heads: int

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = self.channels
        # patch1: depthwise 3³ positional conv
        x = Conv3d(c, 3, groups=c, use_bias=False, name="patch1")(x) + x
        # LocalRC: BN → pw → dw 3³ → BN → pw
        y = BatchNormNoTrack(name="bn1")(x)
        y = nn.Dense(c, use_bias=False, kernel_init=he_normal,
                     name="pw0")(y)
        y = Conv3d(c, 3, groups=c, use_bias=False, name="dw")(y)
        y = BatchNormNoTrack(name="bn2")(y)
        y = nn.Dense(c, use_bias=False, kernel_init=he_normal,
                     name="pw1")(y)
        x = y + x
        # LineConv1
        z = nn.Dense(4 * c, use_bias=False, kernel_init=he_normal,
                     name="lc1_up")(x)
        z = nn.Dense(c, use_bias=False, kernel_init=he_normal,
                     name="lc1_down")(nn.gelu(z, approximate=False))
        x = z + x
        # patch2
        x = Conv3d(c, 3, groups=c, use_bias=False, name="patch2")(x) + x
        # Global sparse transformer + local reverse diffusion
        s = avg_pool3d(x, 1, self.r) if self.r > 1 else x
        b, d, h, w, _ = s.shape
        qkv = nn.Dense(3 * c, use_bias=False, kernel_init=he_normal,
                       name="qkv")(s)
        hd = c // self.heads
        qkv = qkv.reshape(b, d * h * w, 3, self.heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        # attn[n, m] = softmax_m( Σ_c q[n,c]·k[m,c] ) — the reference
        # defines head_dim**-0.5 but never applies it (quirk preserved).
        scores = jnp.einsum("bnhc,bmhc->bhnm", q, k,
                            preferred_element_type=jnp.float32)
        attn = nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhnm,bmhc->bnhc", attn.astype(v.dtype), v)
        out = out.reshape(b, d, h, w, c)
        # reverse diffusion: depthwise transpose conv r, GN(1), pointwise.
        # Applied even at r=1 (a per-channel affine) — the reference's
        # LocalRD always has conv_trans (Slim_UNETR_Block.py:82-86).
        out = ConvTranspose3d(c, self.r, self.r, groups=c,
                              name="diffuse")(out)
        out = GroupNorm(1, name="gn")(out)
        out = nn.Dense(c, use_bias=False, kernel_init=he_normal,
                       name="pw2")(out)
        x = out + x
        # LineConv2
        z = nn.Dense(4 * c, use_bias=False, kernel_init=he_normal,
                     name="lc2_up")(x)
        z = nn.Dense(c, use_bias=False, kernel_init=he_normal,
                     name="lc2_down")(nn.gelu(z, approximate=False))
        return z + x


class SlimUNETR(nn.Module):
    out_channels: int = 2
    embed_dim: int = 96
    embedding_dim: int = 27
    channels: Tuple[int, ...] = (24, 48, 60)
    blocks: Tuple[int, ...] = (1, 2, 3, 2)
    heads: Tuple[int, ...] = (1, 2, 4, 4)
    r: Tuple[int, ...] = (4, 2, 2, 1)
    dropout: float = 0.3

    @nn.compact
    def __call__(self, x, train: bool = False):
        det = not train
        ch = list(self.channels) + [self.embed_dim]
        strides = (4, 2, 2, 2)

        def down(x, c, s, name):
            y = Conv3d(c, s, stride=s, padding=0, name=f"{name}_conv")(x)
            return GroupNorm(1, name=f"{name}_gn")(y)

        def run_blocks(x, c, n, h, r, name):
            for i in range(n):
                x = SlimBlock(c, r, h, name=f"{name}_{i}")(x, det)
            return x

        skips = []
        for i in range(3):
            x = down(x, ch[i], strides[i], f"enc_down{i}")
            x = run_blocks(x, ch[i], self.blocks[i], self.heads[i],
                           self.r[i], f"enc_block{i}")
            skips.append(x)
        x = down(x, self.embed_dim, 2, "enc_down3")
        b, d, h, w, c = x.shape
        x = run_blocks(x, self.embed_dim, self.blocks[3], self.heads[3],
                       self.r[3], "enc_block3")
        pos = self.param("position_embeddings",
                         nn.initializers.zeros,
                         (1, self.embedding_dim, self.embed_dim))
        x = x.reshape(b, d * h * w, c) + pos
        x = nn.Dropout(self.dropout)(x, deterministic=det)
        # Reference quirk (Decoder.py:58): the (B, N, C) token tensor is
        # reshaped straight to (B, C, W, H, Z) with NO transpose, so
        # tokens and channels scramble at the bottleneck. Preserved —
        # it is part of the trained function (and of weight-import
        # parity): channels-last equivalent is reshape (C, N) + swap.
        x = x.reshape(b, c, d * h * w)
        x = jnp.swapaxes(x, 1, 2).reshape(b, d, h, w, c)

        def up(x, c, s, name):
            y = ConvTranspose3d(c, s, s, name=f"{name}_conv")(x)
            return GroupNorm(1, name=f"{name}_gn")(y)

        x = run_blocks(x, self.embed_dim, self.blocks[3], self.heads[3],
                       self.r[3], "dec_block3")
        x = up(x, ch[2], 2, "dec_up3") + skips[2]
        x = run_blocks(x, ch[2], self.blocks[2], self.heads[2], self.r[2],
                       "dec_block2")
        x = up(x, ch[1], 2, "dec_up2") + skips[1]
        x = run_blocks(x, ch[1], self.blocks[1], self.heads[1], self.r[1],
                       "dec_block1")
        x = up(x, ch[0], 2, "dec_up1") + skips[0]
        x = run_blocks(x, ch[0], self.blocks[0], self.heads[0], self.r[0],
                       "dec_block0")
        return up(x, self.out_channels, 4, "seg_head")


@register_model("SlimUNETR")
def build_slim_unetr(cfg: dict) -> SlimUNETR:
    return SlimUNETR(
        out_channels=cfg.get("out_channels", 2),
        embed_dim=cfg.get("embed_dim", 96),
        embedding_dim=cfg.get("embedding_dim", 27),
        channels=tuple(cfg.get("channels", (24, 48, 60))),
        blocks=tuple(cfg.get("blocks", (1, 2, 3, 2))),
        heads=tuple(cfg.get("heads", (1, 2, 4, 4))),
        r=tuple(cfg.get("r", (4, 2, 2, 1))),
        dropout=cfg.get("dropout", 0.3),
    )
