"""UNETR++ baseline (``compared_model/unetr_pp/.../unetr_pp_tumor.py``).

Efficient Paired Attention (EPA) encoder: conv downsample stem (k=4 s=4,
then k=2 s=2) with GroupNorm, stages of EPA transformer blocks (shared
q/k; channel attention with learnable per-head temperature over
L2-normalized q/k, plus spatial attention through a learned
sequence-projection matrix EF), each block followed by a
UnetResBlock(batch-norm) + dropout-conv refinement. Decoder: transpose
conv + additive skip + EPA blocks; last stage conv-only; deep supervision
heads at 1×, ×4, ×8 (align-corners).
"""

from __future__ import annotations

import math
from typing import List, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...nn.basic import he_normal
from ...nn.norms import LayerNorm
from ...ops.resize import resize_trilinear
from ..registry import register_model
from .common import (BatchNormNoTrack, ChannelDropout, Conv3d,
                     ConvTranspose3d, GroupNorm)


class UnetResBlock(nn.Module):
    features: int
    norm: str = "instance"   # or "batch"

    def _norm(self, name):
        if self.norm == "batch":
            return BatchNormNoTrack(name=name)
        from ...nn.norms import InstanceNorm
        return InstanceNorm(name=name)

    @nn.compact
    def __call__(self, x):
        # monai get_conv_layer defaults bias=False (dynunet_block.py:225)
        res = x
        y = Conv3d(self.features, 3, use_bias=False, name="conv1")(x)
        y = nn.leaky_relu(self._norm("norm1")(y), 0.01)
        y = Conv3d(self.features, 3, use_bias=False, name="conv2")(y)
        y = self._norm("norm2")(y)
        if res.shape[-1] != self.features:
            res = Conv3d(self.features, 1, padding=0, use_bias=False,
                         name="conv3")(res)
            res = self._norm("norm3")(res)
        return nn.leaky_relu(y + res, 0.01)


class EPA(nn.Module):
    input_size: int
    hidden_size: int
    proj_size: int
    num_heads: int = 4
    attn_drop: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool):
        b, n, c = x.shape
        h = self.num_heads
        hd = c // h
        qkvv = nn.Dense(4 * c, use_bias=False, kernel_init=he_normal,
                        name="qkvv")(x)
        qkvv = qkvv.reshape(b, n, 4, h, hd).transpose(2, 0, 3, 4, 1)
        # each: (B, h, hd, N)
        q, k, v_ca, v_sa = qkvv[0], qkvv[1], qkvv[2], qkvv[3]

        # reference init_: U(-1/sqrt(proj), 1/sqrt(proj))
        ef = self.param(
            "EF",
            lambda key, shape: (nn.initializers.uniform(2.0)(key, shape)
                                - 1.0) / math.sqrt(self.proj_size),
            (self.input_size, self.proj_size))
        k_proj = jnp.einsum("bhdn,nk->bhdk", k, ef)
        v_sa_proj = jnp.einsum("bhdn,nk->bhdk", v_sa, ef)

        def l2norm(t):
            return t / (jnp.linalg.norm(t, axis=-1, keepdims=True) + 1e-12)

        qn = l2norm(q)
        kn = l2norm(k)
        temp = self.param("temperature", nn.initializers.ones, (h, 1, 1))
        temp2 = self.param("temperature2", nn.initializers.ones, (h, 1, 1))

        # channel attention: (B,h,hd,hd)
        attn_ca = jnp.einsum("bhdn,bhen->bhde", qn, kn,
                             preferred_element_type=jnp.float32) * temp
        attn_ca = nn.softmax(attn_ca, axis=-1)
        attn_ca = nn.Dropout(self.attn_drop)(attn_ca,
                                             deterministic=deterministic)
        x_ca = jnp.einsum("bhde,bhen->bhdn", attn_ca.astype(v_ca.dtype),
                          v_ca)
        x_ca = x_ca.transpose(0, 3, 1, 2).reshape(b, n, c)

        # spatial attention: (B,h,N,proj)
        attn_sa = jnp.einsum("bhdn,bhdk->bhnk", qn, k_proj,
                             preferred_element_type=jnp.float32) * temp2
        attn_sa = nn.softmax(attn_sa, axis=-1)
        attn_sa = nn.Dropout(self.attn_drop)(attn_sa,
                                             deterministic=deterministic)
        x_sa = jnp.einsum("bhnk,bhdk->bhnd", attn_sa.astype(v_sa.dtype),
                          v_sa_proj)
        # Reference quirk (transformerblock.py:131): the spatial path is
        # permuted (B,h,N,hd)→(B,hd,h,N) and reshaped straight to
        # (B,N,C) — a channel/token scramble (the channel path uses the
        # clean permute). Part of the trained function; preserved.
        x_sa = x_sa.transpose(0, 3, 1, 2).reshape(b, n, c)
        return x_ca + x_sa


class EPABlock(nn.Module):
    input_size: int
    hidden_size: int
    proj_size: int
    num_heads: int = 4
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool):
        b, d, hh, w, c = x.shape
        n = d * hh * w
        seq = x.reshape(b, n, c)
        pos = self.param("pos_embed", nn.initializers.zeros, (1, n, c))
        seq = seq + pos
        gamma = self.param("gamma",
                           lambda k, s: 1e-6 * jnp.ones(s), (c,))
        attn = EPA(self.input_size, c, self.proj_size, self.num_heads,
                   self.dropout_rate, name="epa")(
                       LayerNorm(eps=1e-5, name="norm")(seq), deterministic)
        seq = seq + gamma * attn
        vol = seq.reshape(b, d, hh, w, c)
        y = UnetResBlock(c, norm="batch", name="conv51")(vol)
        y = ChannelDropout(0.1, name="drop")(y, deterministic)
        y = Conv3d(c, 1, padding=0, name="conv8")(y)
        return vol + y


class UNETRPP(nn.Module):
    out_channels: int = 2
    patch_size: Tuple[int, int, int] = (96, 96, 96)
    feature_size: int = 16
    num_heads: int = 4
    depths: Tuple[int, ...] = (3, 3, 3, 3)
    dims: Tuple[int, ...] = (32, 64, 128, 256)
    proj_sizes: Tuple[int, ...] = (64, 64, 64, 32)
    do_ds: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        det = not train
        ps = self.patch_size
        sizes = [tuple(s // 2 ** i for s in ps) for i in range(2, 6)]
        input_sizes = [s[0] * s[1] * s[2] for s in sizes]

        conv_block = UnetResBlock(self.feature_size, name="encoder1")(x)

        h = x
        hidden = []
        for i in range(4):
            if i == 0:
                h = Conv3d(self.dims[0], 4, stride=4, padding=0,
                           use_bias=False, name="stem_conv")(h)
                h = GroupNorm(num_groups=x.shape[-1], name="stem_norm")(h)
            else:
                g = self.dims[i - 1]
                h = Conv3d(self.dims[i], 2, stride=2, padding=0,
                           use_bias=False, name=f"down{i}_conv")(h)
                h = GroupNorm(num_groups=g, name=f"down{i}_norm")(h)
            for j in range(self.depths[i]):
                h = EPABlock(input_sizes[i], self.dims[i],
                             self.proj_sizes[i], self.num_heads,
                             name=f"stage{i}_block{j}")(h, det)
            hidden.append(h)

        enc1, enc2, enc3, enc4 = hidden
        f = self.feature_size

        def up_stage(xin, skip, ch, in_size, name, conv_decoder=False,
                     up_k=2):
            y = ConvTranspose3d(ch, up_k, up_k, use_bias=False,
                                name=f"{name}_up")(xin)
            y = y + skip
            if conv_decoder:
                return UnetResBlock(ch, name=f"{name}_conv")(y)
            for j in range(3):
                y = EPABlock(in_size, ch, 64, self.num_heads,
                             name=f"{name}_block{j}")(y, det)
            return y

        dec3 = up_stage(enc4, enc3, f * 8, input_sizes[2], "decoder5")
        dec2 = up_stage(dec3, enc2, f * 4, input_sizes[1], "decoder4")
        dec1 = up_stage(dec2, enc1, f * 2, input_sizes[0], "decoder3")
        out = up_stage(dec1, conv_block, f,
                       ps[0] * ps[1] * ps[2], "decoder2",
                       conv_decoder=True, up_k=4)

        logits = [nn.Dense(self.out_channels, kernel_init=he_normal,
                           name="out1")(out)]
        if self.do_ds and train:
            full = out.shape[1:4]
            o2 = nn.Dense(self.out_channels, kernel_init=he_normal,
                          name="out2")(dec1)
            o3 = nn.Dense(self.out_channels, kernel_init=he_normal,
                          name="out3")(dec2)
            logits.append(resize_trilinear(o2, full))
            logits.append(resize_trilinear(o3, full))
            return logits
        return logits[0]


@register_model("UNETRpp")
def build_unetrpp(cfg: dict) -> UNETRPP:
    return UNETRPP(
        out_channels=cfg.get("out_channels", 2),
        patch_size=tuple(cfg.get("patch_size", (96, 96, 96))),
        feature_size=cfg.get("feature_size", 16),
        num_heads=cfg.get("num_heads", 4),
        depths=tuple(cfg.get("depths", (3, 3, 3, 3))),
        dims=tuple(cfg.get("dims", (32, 64, 128, 256))),
        do_ds=cfg.get("do_ds", True),
    )
