"""SwinUNETR baseline (reference registers MONAI ``SwinUNETR``,
``utils/load_model.py:22-24``, config {in_channels, out_channels}).

MONAI defaults reproduced: Swin-ViT 3D backbone (patch 2, embed 24,
depths 2/2/2/2, heads 3/6/12/24, window 7³, shifted windows with cyclic
shift + attention mask, patch-merging between stages, stage-normalized
hidden states) and a UNETR-style decoder of residual conv blocks
(instance norm) with deconv upsamples.

All window bookkeeping (padding, shift masks, relative-position index)
is static numpy computed from the config — trace-time constants.
"""

from __future__ import annotations

import functools
import itertools
import math
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ...nn.basic import he_normal
from ...nn.norms import InstanceNorm, LayerNorm
from ...nn.pwa import RelativePositionBias
from ..registry import register_model
from .common import Conv3d, ConvTranspose3d


@functools.lru_cache(maxsize=None)
def _shift_attn_mask(padded: Tuple[int, ...], window: Tuple[int, ...],
                     shift: Tuple[int, ...]) -> np.ndarray:
    """Swin shifted-window attention mask: (num_windows, l, l) with 0 for
    allowed pairs and -100 for pairs from different pre-shift regions."""
    d, h, w = padded
    img = np.zeros((d, h, w), np.int32)
    cnt = 0
    slices = lambda s, ws: (slice(0, -ws), slice(-ws, -s), slice(-s, None))
    for sd in slices(shift[0], window[0]):
        for sh in slices(shift[1], window[1]):
            for sw in slices(shift[2], window[2]):
                img[sd, sh, sw] = cnt
                cnt += 1
    wd, wh, ww = window
    img = img.reshape(d // wd, wd, h // wh, wh, w // ww, ww)
    img = img.transpose(0, 2, 4, 1, 3, 5).reshape(-1, wd * wh * ww)
    diff = img[:, :, None] - img[:, None, :]
    return np.where(diff == 0, 0.0, -100.0).astype(np.float32)


def _pad_to_windows(x, window):
    b, d, h, w, c = x.shape
    pads = [(0, (ws - s % ws) % ws) for s, ws in zip((d, h, w), window)]
    if any(p[1] for p in pads):
        x = jnp.pad(x, ((0, 0), pads[0], pads[1], pads[2], (0, 0)))
    return x, pads


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window: Tuple[int, int, int]

    @nn.compact
    def __call__(self, xw, mask):
        """xw: (B·nW, l, C); mask: (nW, l, l) or None."""
        bn, l, c = xw.shape
        h = self.num_heads
        hd = c // h
        qkv = nn.Dense(3 * c, kernel_init=he_normal, name="qkv")(xw)
        qkv = qkv.reshape(bn, l, 3, h, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scores = jnp.einsum("bnhc,bmhc->bhnm", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores * (hd ** -0.5)
        bias = RelativePositionBias(window=self.window, num_heads=h,
                                    name="rpb")()
        scores = scores + bias[None]
        if mask is not None:
            nw = mask.shape[0]
            scores = scores.reshape(bn // nw, nw, h, l, l) + \
                mask[None, :, None]
            scores = scores.reshape(bn, h, l, l)
        attn = nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bmhc->bnhc", attn, v).reshape(bn, l, c)
        return nn.Dense(c, kernel_init=he_normal, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: Tuple[int, int, int] = (7, 7, 7)
    shift: bool = False
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        b, d, h, w, c = x.shape
        win = tuple(min(ws, s) for ws, s in zip(self.window, (d, h, w)))
        shift = tuple(ws // 2 if (self.shift and ws < s) else 0
                      for ws, s in zip(win, (d, h, w)))

        res = x
        y = LayerNorm(name="norm1")(x)
        if any(shift):
            y = jnp.roll(y, tuple(-s for s in shift), axis=(1, 2, 3))
        y, pads = _pad_to_windows(y, win)
        pd, ph, pw = y.shape[1:4]
        nw = (pd // win[0]) * (ph // win[1]) * (pw // win[2])
        y = y.reshape(b, pd // win[0], win[0], ph // win[1], win[1],
                      pw // win[2], win[2], c)
        y = y.transpose(0, 1, 3, 5, 2, 4, 6, 7)
        y = y.reshape(b * nw, win[0] * win[1] * win[2], c)

        mask = None
        if any(shift):
            mask = jnp.asarray(_shift_attn_mask((pd, ph, pw), win, shift))
        y = WindowAttention(self.dim, self.num_heads, win,
                            name="attn")(y, mask)

        y = y.reshape(b, pd // win[0], ph // win[1], pw // win[2],
                      win[0], win[1], win[2], c)
        y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(b, pd, ph, pw, c)
        y = y[:, :d, :h, :w, :]
        if any(shift):
            y = jnp.roll(y, shift, axis=(1, 2, 3))
        x = res + y

        z = LayerNorm(name="norm2")(x)
        z = nn.Dense(int(c * self.mlp_ratio), kernel_init=he_normal,
                     name="fc1")(z)
        z = nn.gelu(z, approximate=False)
        z = nn.Dense(c, kernel_init=he_normal, name="fc2")(z)
        return x + z


class SwinPatchMerging(nn.Module):
    """MONAI Swin merging: 8-way sample → LN → Dense(2C, no bias)."""

    @nn.compact
    def __call__(self, x):
        b, d, h, w, c = x.shape
        pads = [(0, s % 2) for s in (d, h, w)]
        if any(p[1] for p in pads):
            x = jnp.pad(x, ((0, 0), pads[0], pads[1], pads[2], (0, 0)))
        parts = [x[:, i::2, j::2, k::2, :]
                 for i, j, k in itertools.product((0, 1), repeat=3)]
        y = jnp.concatenate(parts, axis=-1)
        y = LayerNorm(name="norm")(y)
        return nn.Dense(2 * c, use_bias=False, kernel_init=he_normal,
                        name="reduction")(y)


class ResBlock(nn.Module):
    """UnetrBasicBlock: conv3-IN-lrelu ×2 + projected residual."""

    features: int

    @nn.compact
    def __call__(self, x):
        # monai get_conv_layer defaults bias=False (dynunet_block)
        res = x
        y = Conv3d(self.features, 3, use_bias=False, name="conv1")(x)
        y = nn.leaky_relu(InstanceNorm()(y), 0.01)
        y = Conv3d(self.features, 3, use_bias=False, name="conv2")(y)
        y = InstanceNorm()(y)
        if res.shape[-1] != self.features:
            res = Conv3d(self.features, 1, padding=0, use_bias=False,
                         name="conv3")(res)
            res = InstanceNorm()(res)
        return nn.leaky_relu(y + res, 0.01)


class SwinUNETR(nn.Module):
    out_channels: int = 2
    feature_size: int = 24
    depths: Tuple[int, ...] = (2, 2, 2, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window: Tuple[int, int, int] = (7, 7, 7)

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.feature_size
        # patch embed: conv k=2 s=2
        h0 = Conv3d(f, 2, stride=2, padding=0, name="patch_embed")(x)

        hiddens = [h0]
        h = h0
        for i, (depth, heads) in enumerate(zip(self.depths,
                                               self.num_heads)):
            for j in range(depth):
                h = SwinBlock(h.shape[-1], heads, self.window,
                              shift=(j % 2 == 1),
                              name=f"stage{i}_block{j}")(h)
            h = SwinPatchMerging(name=f"merge{i}")(h)
            hiddens.append(h)
        # MONAI normalizes each hidden state with an out-projection norm;
        # the decoder consumes [input, h0, h1, h2, h3, h4].
        hiddens = [LayerNorm(name=f"hs_norm{i}")(hs)
                   for i, hs in enumerate(hiddens)]
        hs0, hs1, hs2, hs3, hs4 = hiddens

        enc0 = ResBlock(f, name="encoder1")(x)
        enc1 = ResBlock(f, name="encoder2")(hs0)
        enc2 = ResBlock(2 * f, name="encoder3")(hs1)
        enc3 = ResBlock(4 * f, name="encoder4")(hs2)
        bottleneck = ResBlock(16 * f, name="encoder10")(hs4)

        def up(xin, skip, ch, name):
            y = ConvTranspose3d(ch, 2, 2, name=f"{name}_deconv")(xin)
            return ResBlock(ch, name=f"{name}_conv")(
                jnp.concatenate([y, skip], axis=-1))

        d4 = up(bottleneck, hs3, 8 * f, "decoder5")
        d3 = up(d4, enc3, 4 * f, "decoder4")
        d2 = up(d3, enc2, 2 * f, "decoder3")
        d1 = up(d2, enc1, f, "decoder2")
        d0 = up(d1, enc0, f, "decoder1")
        return nn.Dense(self.out_channels, kernel_init=he_normal,
                        name="out")(d0)


@register_model("SwinUNETR")
def build_swin_unetr(cfg: dict) -> SwinUNETR:
    return SwinUNETR(out_channels=cfg.get("out_channels", 2),
                     feature_size=cfg.get("feature_size", 24))
