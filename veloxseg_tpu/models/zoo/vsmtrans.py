"""VSmTrans baseline (``compared_model/VSmTrans/VSmTrans.py``:
``VSmixTUnet``).

Variable-Shape mixed window transformer: each block computes qkv once,
splits it into four channel groups that attend over four different window
shapes (cubic w³; (s, H, s); (s, s, W); (D, s, s)) — odd blocks shifted
Swin-style with attention masks — plus a parallel conv branch
(3C→C linear + LN + depthwise conv + BN + LeakyReLU), combined with two
learned scalar rates (init 0.5). UNETR-style residual-block decoder with
5 deep-supervision heads (the reference's 'VSmTrans' loss branch).

Preserved quirks: the reference's PatchMerging samples a duplicated
shift pattern ((0,1,0) and (0,0,1) appear twice instead of (1,1,0)/
(0,1,1)); stage outputs use group_norm(12) WITHOUT affine params.
"""

from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ...nn.basic import DropPath, he_normal
from ...nn.norms import LayerNorm
from ...nn.pwa import RelativePositionBias
from ...ops.resize import resize_trilinear
from ..registry import register_model
from .common import BatchNormNoTrack, Conv3d
from .swin_unetr import ResBlock
from .common import ConvTranspose3d


def _vsa_window(idx: int, img: Sequence[int], split: int,
                window: int) -> Tuple[Tuple[int, int, int],
                                      Tuple[int, int, int]]:
    d, h, w = img
    if idx == 0:
        win = (min(window, d), min(window, h), min(window, w))
    elif idx == 1:
        win = (min(split, d), h, min(split, w))
    elif idx == 2:
        win = (min(split, d), min(split, h), w)
    else:
        win = (d, min(split, h), min(split, w))
    shift = tuple(ws // 2 if s > ws else 0 for ws, s in zip(win, img))
    return win, shift


@functools.lru_cache(maxsize=None)
def _vsm_mask(padded: Tuple[int, ...], window: Tuple[int, ...],
              shift: Tuple[int, ...]) -> np.ndarray:
    """compute_mask parity, incl. its slice(-0)==whole-axis behavior."""
    img = np.zeros(padded, np.int32)
    cnt = 0

    def ranges(ws, sf, size):
        out = []
        for sl in (slice(None, -ws or None), slice(-ws, -sf if sf else None),
                   slice(-sf, None) if sf else slice(0, None)):
            out.append(sl)
        return out

    for sd in ranges(window[0], shift[0], padded[0]):
        for sh in ranges(window[1], shift[1], padded[1]):
            for sw in ranges(window[2], shift[2], padded[2]):
                img[sd, sh, sw] = cnt
                cnt += 1
    wd, wh, ww = window
    d, h, w = padded
    img = img.reshape(d // wd, wd, h // wh, wh, w // ww, ww)
    img = img.transpose(0, 2, 4, 1, 3, 5).reshape(-1, wd * wh * ww)
    diff = img[:, :, None] - img[:, None, :]
    return np.where(diff == 0, 0.0, -100.0).astype(np.float32)


class VariableShapeAttention(nn.Module):
    """One window-shape attention over a (…, 3·c) qkv channel group."""

    feature: int          # c per group
    idx: int
    split: int
    window: int
    num_head: int
    img_size: Tuple[int, int, int]
    shift: bool = False
    attn_drop: float = 0.1

    @nn.compact
    def __call__(self, qkv, deterministic: bool):
        b, d, h, w, c3 = qkv.shape
        c = c3 // 3
        win, shift = _vsa_window(self.idx, self.img_size, self.split,
                                 self.window)
        shift = shift if self.shift else (0, 0, 0)

        pads = [(0, (ws - s % ws) % ws) for s, ws in zip((d, h, w), win)]
        if any(p[1] for p in pads):
            qkv = jnp.pad(qkv, ((0, 0), pads[0], pads[1], pads[2], (0, 0)))
        pd, ph, pw = qkv.shape[1:4]
        if any(shift):
            qkv = jnp.roll(qkv, tuple(-s for s in shift), axis=(1, 2, 3))

        heads = self.num_head
        hd = c // heads
        l = win[0] * win[1] * win[2]
        nw = (pd // win[0]) * (ph // win[1]) * (pw // win[2])
        # reference window_partition interleaves heads: the per-head
        # channel factor is (hd, heads) with HEAD FASTEST
        # (VSmTrans.py:33 ``reshape(..., C // num_heads, num_heads)``)
        y = qkv.reshape(b, pd // win[0], win[0], ph // win[1], win[1],
                        pw // win[2], win[2], 3, hd, heads)
        y = y.transpose(7, 0, 1, 3, 5, 9, 2, 4, 6, 8)
        y = y.reshape(3, b * nw, heads, l, hd)
        # reference quirk (VSmTrans.py:186): the softmax scale uses
        # head_dim = 4*feature // num_head — 4x the true per-head width
        scale = (4 * self.feature // self.num_head) ** -0.5
        q, k, v = y[0] * scale, y[1], y[2]

        s = jnp.einsum("bhnc,bhmc->bhnm", q, k,
                       preferred_element_type=jnp.float32)
        bias = RelativePositionBias(window=win, num_heads=heads,
                                    name="rpb")()
        s = s + bias[None]
        if any(shift):
            mask = jnp.asarray(_vsm_mask((pd, ph, pw), win, shift))
            s = s.reshape(b, nw, heads, l, l) + mask[None, :, None]
            s = s.reshape(b * nw, heads, l, l)
        a = nn.softmax(s, axis=-1)
        a = nn.Dropout(self.attn_drop)(a, deterministic=deterministic)
        o = jnp.einsum("bhnm,bhmc->bhnc", a.astype(v.dtype), v)
        o = o.reshape(b, pd // win[0], ph // win[1], pw // win[2],
                      heads, win[0], win[1], win[2], hd)
        # merge back with the same head-fastest channel interleave
        o = o.transpose(0, 1, 5, 2, 6, 3, 7, 8, 4)
        o = o.reshape(b, pd, ph, pw, c)
        if any(shift):
            o = jnp.roll(o, shift, axis=(1, 2, 3))
        return o[:, :d, :h, :w, :]


class VSmixMSA(nn.Module):
    feature: int
    split: int
    window: int
    num_head: int
    img_size: Tuple[int, int, int]
    shift: bool = False
    qkv_bias: bool = True
    attn_drop: float = 0.1
    drop: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool):
        f = self.feature
        qkv = nn.Dense(3 * f, use_bias=self.qkv_bias,
                       kernel_init=he_normal, name="qkv")(x)
        # conv branch on full qkv
        cx = nn.Dense(f, kernel_init=he_normal, name="conv1")(
            nn.gelu(qkv, approximate=False))
        cx = LayerNorm(name="conv_norm1")(cx)
        cx = Conv3d(f, 3, name="dep_conv")(cx)
        cx = nn.leaky_relu(BatchNormNoTrack(name="conv_norm2")(cx), 0.01)
        # four variable-shape attentions over channel quarters of qkv
        c3 = qkv.shape[-1]
        parts = []
        for i in range(4):
            grp = qkv[..., i * c3 // 4:(i + 1) * c3 // 4]
            parts.append(VariableShapeAttention(
                feature=f // 4, idx=i, split=self.split,
                window=self.window, num_head=self.num_head,
                img_size=self.img_size, shift=self.shift,
                attn_drop=self.attn_drop,
                name=f"attn{i}")(grp, deterministic))
        ax = jnp.concatenate(parts, axis=-1)
        ax = nn.Dense(f, kernel_init=he_normal, name="proj")(ax)
        ax = nn.Dropout(self.drop)(ax, deterministic=deterministic)
        rate1 = self.param("rate1", lambda k: jnp.full((1,), 0.5))
        rate2 = self.param("rate2", lambda k: jnp.full((1,), 0.5))
        y = rate1 * ax + rate2 * cx
        return nn.Dropout(self.drop)(y, deterministic=deterministic)


class VSmixedBlock(nn.Module):
    feature: int
    split: int
    window: int
    num_head: int
    img_size: Tuple[int, int, int]
    shift: bool = False
    mlp_ratio: float = 4.0
    drop: float = 0.1
    drop_path: float = 0.1
    attn_drop: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool):
        dp = DropPath(self.drop_path)
        y = VSmixMSA(self.feature, self.split, self.window, self.num_head,
                     self.img_size, self.shift, attn_drop=self.attn_drop,
                     drop=self.drop, name="attn")(
                         LayerNorm(eps=1e-5, name="norm1")(x), deterministic)
        x = x + dp(y, deterministic)
        z = LayerNorm(eps=1e-5, name="norm2")(x)
        z = nn.Dense(int(self.feature * self.mlp_ratio),
                     kernel_init=he_normal, name="fc1")(z)
        z = nn.gelu(z, approximate=False)
        z = nn.Dropout(self.drop)(z, deterministic=deterministic)
        z = nn.Dense(self.feature, kernel_init=he_normal, name="fc2")(z)
        z = nn.Dropout(self.drop)(z, deterministic=deterministic)
        return x + dp(z, deterministic)


class VSPatchMerging(nn.Module):
    """Reference merging incl. its duplicated sample pattern."""

    @nn.compact
    def __call__(self, x):
        b, d, h, w, c = x.shape
        pads = [(0, s % 2) for s in (d, h, w)]
        if any(p[1] for p in pads):
            x = jnp.pad(x, ((0, 0), pads[0], pads[1], pads[2], (0, 0)))
        offs = [(0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1),
                (1, 0, 1), (0, 1, 0), (0, 0, 1), (1, 1, 1)]
        parts = [x[:, i::2, j::2, k::2, :] for i, j, k in offs]
        y = jnp.concatenate(parts, axis=-1)
        y = LayerNorm(eps=1e-5, name="norm")(y)
        return nn.Dense(2 * c, use_bias=False, kernel_init=he_normal,
                        name="reduction")(y)


def _group_norm_12(x):
    """F.group_norm(num_groups=12) without affine (reference quirk)."""
    b = x.shape[0]
    c = x.shape[-1]
    g = 12
    shape = x.shape
    xf = x.astype(jnp.float32).reshape(b, -1, g, c // g)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = jnp.square(xf - mean).mean(axis=(1, 3), keepdims=True)
    return ((xf - mean) / jnp.sqrt(var + 1e-5)).reshape(shape).astype(
        x.dtype)


class VSmixTUnet(nn.Module):
    out_channels: int = 2
    img_size: Tuple[int, int, int] = (96, 96, 96)
    feature_size: int = 24
    split_size: Tuple[int, ...] = (1, 2, 3, 4)
    window: int = 6
    depths: Tuple[int, ...] = (2, 2, 2, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    patch: int = 2
    do_ds: bool = True
    drop: float = 0.1
    attn_drop: float = 0.1
    drop_path_rate: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        det = not train
        f = self.feature_size
        # stage image sizes (ceil halving, reference parity)
        sizes = []
        cur = list(self.img_size)
        for _ in range(4):
            cur = [(s + 1) // 2 for s in cur]
            sizes.append(tuple(cur))
        dpr = np.linspace(0, self.drop_path_rate,
                          sum(self.depths)).tolist()

        h = Conv3d(f, self.patch, stride=self.patch, padding=0,
                   name="patch_embed")(x)
        h = LayerNorm(eps=1e-5, name="patch_norm")(h)
        h = nn.Dropout(self.drop)(h, deterministic=det)

        hiddens = []
        for i in range(4):
            fi = f * 2 ** i
            for j in range(self.depths[i]):
                h = VSmixedBlock(
                    fi, self.split_size[i], self.window,
                    self.num_heads[i], sizes[i], shift=(j % 2 == 1),
                    drop=self.drop, attn_drop=self.attn_drop,
                    drop_path=dpr[sum(self.depths[:i]) + j],
                    name=f"stage{i}_block{j}")(h, det)
            hiddens.append(_group_norm_12(h))
            h = VSPatchMerging(name=f"merge{i}")(h)
        hiddens.append(_group_norm_12(h))
        hs0, hs1, hs2, hs3, hs4 = hiddens

        enc0 = ResBlock(f, name="encoder1")(x)
        enc1 = ResBlock(f, name="encoder2")(hs0)
        enc2 = ResBlock(2 * f, name="encoder3")(hs1)
        enc3 = ResBlock(4 * f, name="encoder4")(hs2)
        enc4 = ResBlock(8 * f, name="encoder5")(hs3)

        def up(xin, skip, ch, name, k=2):
            y = ConvTranspose3d(ch, k, k, use_bias=False,
                                name=f"{name}_deconv")(xin)
            return ResBlock(ch, name=f"{name}_conv")(
                jnp.concatenate([y, skip], axis=-1))

        dec3 = up(hs4, enc4, 8 * f, "decoder5")
        dec2 = up(dec3, enc3, 4 * f, "decoder4")
        dec1 = up(dec2, enc2, 2 * f, "decoder3")
        dec0 = up(dec1, enc1, f, "decoder2")
        out = up(dec0, enc0, f, "decoder1", k=self.patch)
        logits = nn.Dense(self.out_channels, kernel_init=he_normal,
                          name="out")(out)
        if self.do_ds and train:
            full = logits.shape[1:4]
            heads = []
            for name, feat in (("out_0", dec0), ("out_1", dec1),
                               ("out_2", dec2), ("out_3", dec3)):
                o = nn.Dense(self.out_channels, kernel_init=he_normal,
                             name=name)(feat)
                heads.append(resize_trilinear(o, full))
            return [logits] + heads
        return logits


@register_model("VSmTrans")
def build_vsmtrans(cfg: dict) -> VSmixTUnet:
    return VSmixTUnet(
        out_channels=cfg.get("out_channels", 2),
        img_size=tuple(cfg.get("img_size", (96, 96, 96))),
        feature_size=cfg.get("feature_size", 24),
        split_size=tuple(cfg.get("split_size", (1, 2, 3, 4))),
        window=cfg.get("window_size", 6),
        depths=tuple(cfg.get("depths", (2, 2, 2, 2))),
        num_heads=tuple(cfg.get("num_heads", (3, 6, 12, 24))),
        patch=(cfg.get("patch_size", [2, 2, 2])[0]
               if isinstance(cfg.get("patch_size", 2), (list, tuple))
               else cfg.get("patch_size", 2)),
        do_ds=cfg.get("do_ds", True),
    )
