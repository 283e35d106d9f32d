"""NestedFormer baseline
(``compared_model/NestedFormer/medical/model/nested_former.py``).

Per-modality global-poolformer encoders (conv stem + stages of
patch-embed → [global-pool token mixing + channel MLP] blocks), a nested
modality-aware fusion at the bottleneck (NMaFa: tri-axial + 3-D-window
self attention over concatenated modality features, then cross-modality
attention against token-learner-compressed per-modality tokens), and a
UNet-style up path over conv-fused per-level skips.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ...nn.basic import he_normal
from ...nn.norms import InstanceNorm, LayerNorm
from ..registry import register_model
from .common import Conv3d, ConvTranspose3d


class TwoConv(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        for i in range(2):
            x = Conv3d(self.features, 3, name=f"conv{i}")(x)
            x = nn.relu(InstanceNorm()(x))
        return x


class ChannelLN(nn.Module):
    """LayerNormChannel parity (channel-axis LN, eps 1e-5)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        w = self.param("weight", nn.initializers.ones, (c,))
        b = self.param("bias", nn.initializers.zeros, (c,))
        xf = x.astype(jnp.float32)
        u = xf.mean(axis=-1, keepdims=True)
        s = jnp.square(xf - u).mean(axis=-1, keepdims=True)
        y = ((xf - u) / jnp.sqrt(s + self.eps)).astype(x.dtype)
        return y * w.astype(x.dtype) + b.astype(x.dtype)


class GlobalPoolBlock(nn.Module):
    """BlockPool: global-mean token broadcast by a learned position map."""

    hidden: int
    mlp_dim: int
    n_positions: int

    @nn.compact
    def __call__(self, x, deterministic: bool):
        b, d, h, w, c = x.shape
        res = x
        y = ChannelLN(eps=1e-6, name="attn_norm")(x)
        mean = y.reshape(b, -1, c).mean(axis=1)                  # (b, c)
        pos_w = self.param("global_w", nn.initializers.normal(0.02),
                           (self.n_positions,))
        pos_b = self.param("global_b", nn.initializers.zeros,
                           (self.n_positions,))
        g = mean[:, None, :] * pos_w[None, :, None] + \
            pos_b[None, :, None]                                  # (b,p,c)
        g = g.reshape(b, d, h, w, c)
        x = (g + y) + res
        res = x
        y = ChannelLN(eps=1e-6, name="ffn_norm")(x)
        y = nn.Dense(self.mlp_dim, kernel_init=he_normal, name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.hidden, kernel_init=he_normal, name="fc2")(y)
        return y + res


class GlobalPoolformerStage(nn.Module):
    hidden: int
    pool: Tuple[int, int, int] = (2, 2, 2)
    num_layers: int = 2

    @nn.compact
    def __call__(self, x, deterministic: bool):
        p = self.pool
        x = Conv3d(self.hidden, p[0], stride=p[0], padding=0,
                   name="embed")(x)
        x = ChannelLN(name="embed_norm")(x)
        n_pos = math.prod(x.shape[1:4])
        for i in range(self.num_layers):
            x = GlobalPoolBlock(self.hidden, self.hidden * 2, n_pos,
                                name=f"block{i}")(x, deterministic)
        return x


class MHA(nn.Module):
    hidden: int
    heads: int = 8
    drop: float = 0.1

    @nn.compact
    def __call__(self, q_in, kv_in, deterministic: bool):
        hd = self.hidden // self.heads
        q = nn.Dense(self.hidden, kernel_init=he_normal, name="q")(q_in)
        k = nn.Dense(self.hidden, kernel_init=he_normal, name="k")(kv_in)
        v = nn.Dense(self.hidden, kernel_init=he_normal, name="v")(kv_in)
        bq, nq = q.shape[:2]
        nk = k.shape[1]
        q = q.reshape(bq, nq, self.heads, hd)
        k = k.reshape(bq, nk, self.heads, hd)
        v = v.reshape(bq, nk, self.heads, hd)
        s = jnp.einsum("bnhc,bmhc->bhnm", q, k,
                       preferred_element_type=jnp.float32) / math.sqrt(hd)
        a = nn.softmax(s, axis=-1)
        a = nn.Dropout(self.drop)(a, deterministic=deterministic)
        o = jnp.einsum("bhnm,bmhc->bnhc", a.astype(v.dtype), v)
        o = o.reshape(bq, nq, self.hidden)
        o = nn.Dense(self.hidden, kernel_init=he_normal, name="out")(o)
        return nn.Dropout(self.drop)(o, deterministic=deterministic)


@functools.lru_cache(maxsize=None)
def _rel3d_indices(window: Tuple[int, int, int]) -> np.ndarray:
    pts = np.array([[x, y, z] for x in range(window[0])
                    for y in range(window[1]) for z in range(window[2])])
    rel = pts[None, :, :] - pts[:, None, :]
    return (rel - rel.min()).astype(np.int32)     # (l, l, 3)


class Window3DAttention(nn.Module):
    hidden: int
    heads: int
    window: Tuple[int, int, int]

    @nn.compact
    def __call__(self, x):
        b, d, h, w, c = x.shape
        wd, wh, ww = self.window
        hd = self.hidden // self.heads
        qkv = nn.Dense(3 * self.hidden, use_bias=False,
                       kernel_init=he_normal, name="to_qkv")(x)
        nd, nh, nw = d // wd, h // wh, w // ww
        l = wd * wh * ww
        qkv = qkv.reshape(b, nd, wd, nh, wh, nw, ww, 3, self.heads, hd)
        qkv = qkv.transpose(7, 0, 8, 1, 3, 5, 2, 4, 6, 9)
        qkv = qkv.reshape(3, b, self.heads, nd * nh * nw, l, hd)
        q, k, v = qkv[0], qkv[1], qkv[2]
        s = jnp.einsum("bhwic,bhwjc->bhwij", q, k,
                       preferred_element_type=jnp.float32) / math.sqrt(hd)
        rel = _rel3d_indices(tuple(self.window))
        m = int(rel.max()) + 1
        table = self.param("pos_embedding", nn.initializers.normal(1.0),
                           (m, m, m))
        bias = table[rel[..., 0], rel[..., 1], rel[..., 2]]
        s = s + bias
        a = nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhwij,bhwjc->bhwic", a, v)
        o = o.reshape(b, self.heads, nd, nh, nw, wd, wh, ww, hd)
        o = o.transpose(0, 2, 5, 3, 6, 4, 7, 1, 8)
        o = o.reshape(b, d, h, w, self.hidden)
        return nn.Dense(self.hidden, kernel_init=he_normal,
                        name="to_out")(o)


class MultiAttBlock(nn.Module):
    """Tri-axial + window attention block of MultiSpatialFusion."""

    hidden: int
    mlp_dim: int
    window: Tuple[int, int, int]
    is_position: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool):
        b, d, h, w, c = x.shape
        res = x
        y = LayerNorm(name="attn_norm")(x)

        # axial attention over (w,h) slices and over d columns
        x1 = y.transpose(0, 1, 2, 3, 4).reshape(b * d, h * w, c)
        x2 = y.transpose(0, 2, 3, 1, 4).reshape(b * h * w, d, c)
        if self.is_position:
            p1 = self.param("pos1", nn.initializers.zeros, (1, h * w, c))
            p2 = self.param("pos2", nn.initializers.zeros, (1, d, c))
            x1 = x1 + p1
            x2 = x2 + p2
        x1 = MHA(self.hidden, name="v_attn")(x1, x1, deterministic)
        x2 = MHA(self.hidden, name="h_attn")(x2, x2, deterministic)
        x3 = Window3DAttention(self.hidden, 8, self.window,
                               name="win_attn")(y)
        x1 = x1.reshape(b, d, h, w, c)
        x2 = x2.reshape(b, h, w, d, c).transpose(0, 3, 1, 2, 4)
        x = (x1 + x2 + x3) + res

        res = x
        y = LayerNorm(name="ffn_norm")(x)
        y = nn.Dense(self.mlp_dim, kernel_init=he_normal, name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.hidden, kernel_init=he_normal, name="fc2")(y)
        return y + res


class TokenLearner(nn.Module):
    tokens: int

    @nn.compact
    def __call__(self, x):
        b, d, h, w, c = x.shape
        sel = Conv3d(self.tokens, 3, name="token_conv")(x)
        sel = nn.sigmoid(sel.reshape(b, d * h * w, self.tokens))
        flat = x.reshape(b, d * h * w, c)
        # (b, s, c): selection-weighted mean over positions
        return jnp.einsum("bps,bpc->bsc", sel, flat) / (d * h * w)


class NestedFormer(nn.Module):
    model_num: int = 2
    out_channels: int = 2
    image_size: Tuple[int, int, int] = (96, 96, 96)
    fea: Tuple[int, ...] = (16, 16, 32, 64, 128, 16)
    window: Tuple[int, int, int] = (3, 3, 2)
    self_num_layer: int = 2
    token_mixer_size: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        det = not train
        fea = self.fea
        mods = [x[..., m:m + 1] for m in range(self.model_num)]

        per_mod = []   # each: [x0, x1, x2, x3, x4] features
        for m, xm in enumerate(mods):
            feats = [TwoConv(fea[0], name=f"enc{m}_conv0")(xm)]
            for s in range(4):
                feats.append(GlobalPoolformerStage(
                    fea[s + 1], name=f"enc{m}_down{s + 1}")(
                        feats[-1], det))
            per_mod.append(feats)

        def fuse(level, name):
            cat = jnp.concatenate([per_mod[m][level]
                                   for m in range(self.model_num)],
                                  axis=-1)
            return TwoConv(fea[level], name=name)(cat)

        # NMaFa fusion at the bottleneck.
        bott_cat = jnp.concatenate([per_mod[m][4]
                                    for m in range(self.model_num)],
                                   axis=-1)
        q = nn.Dense(fea[4], kernel_init=he_normal,
                     name="spatial_embed")(bott_cat)
        for i in range(self.self_num_layer):
            q = MultiAttBlock(fea[4], 2 * fea[4], self.window,
                              is_position=(i == 0),
                              name=f"spatial_block{i}")(q, det)
        b, d, h, w, _ = q.shape
        q_seq = q.reshape(b, d * h * w, fea[4])
        kv_tokens = []
        # ONE token mixer shared across modalities (the reference's
        # CrossModalityFusion builds a single ``token_mixer`` and applies
        # it to every modality embedding, cross_modality_att.py:140-144).
        token_mixer = TokenLearner(self.token_mixer_size,
                                   name="token_learner")
        for m in range(self.model_num):
            e = nn.Dense(fea[4], kernel_init=he_normal,
                         name=f"cm_embed{m}")(per_mod[m][4])
            n = d * h * w
            pos = self.param(f"cm_pos{m}", nn.initializers.zeros,
                             (1, n, fea[4]))
            e = e.reshape(b, n, fea[4]) + pos
            e = e.reshape(b, d, h, w, fea[4])
            kv_tokens.append(token_mixer(e))
        kv = jnp.concatenate(kv_tokens, axis=1)
        cross = MHA(fea[4], name="cross_attn")(q_seq, kv, det)
        y = LayerNorm(name="cross_norm")(cross + q_seq)
        res = y
        z = nn.Dense(2 * fea[4], kernel_init=he_normal, name="cm_fc1")(y)
        z = nn.gelu(z, approximate=False)
        z = nn.Dense(fea[4], kernel_init=he_normal, name="cm_fc2")(z)
        y = LayerNorm(name="cm_ffn_norm")(z + res)
        fusion = y.reshape(b, d, h, w, fea[4])
        fusion = fusion + fuse(4, "fusion_conv_5")

        def upcat(xin, skip, cat_ch_out, name):
            up = ConvTranspose3d(xin.shape[-1] // 2, 2, 2,
                                 name=f"{name}_up")(xin)
            return TwoConv(cat_ch_out, name=f"{name}_convs")(
                jnp.concatenate([skip, up], axis=-1))

        u4 = upcat(fusion, fuse(3, "fusion_conv_4"), fea[3], "upcat_4")
        u3 = upcat(u4, fuse(2, "fusion_conv_3"), fea[2], "upcat_3")
        u2 = upcat(u3, fuse(1, "fusion_conv_2"), fea[1], "upcat_2")
        u1 = upcat(u2, fuse(0, "fusion_conv_1"), fea[5], "upcat_1")
        return nn.Dense(self.out_channels, kernel_init=he_normal,
                        name="final_conv")(u1)


@register_model("NestedFormer")
def build_nestedformer(cfg: dict) -> NestedFormer:
    return NestedFormer(model_num=cfg.get("model_num", 2),
                        out_channels=cfg.get("out_channels", 2),
                        image_size=tuple(cfg.get("image_size",
                                                 (96, 96, 96))),
                        window=tuple(cfg.get("window_size", (3, 3, 2))))
