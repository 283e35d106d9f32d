"""HDenseFormer baseline (``compared_model/HDense/HDenseFormer.py``,
registered via ``HDenseFormer_16``).

Hybrid: per-modality dense-transformer branches (patch-16 embed + zero
position embeddings + densely-connected attention blocks with growth rate
32) fused into a conv U-Net (IN+ReLU double convs, maxpool, transpose-conv
up path) with 4 deep-supervision heads upsampled align-corners.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from ...nn.basic import he_normal
from ...nn.norms import InstanceNorm, LayerNorm
from ...ops.resize import resize_trilinear
from ..registry import register_model
from .common import Conv3d, GroupNorm, max_pool3d


class MHA(nn.Module):
    dim: int
    heads: int = 8
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, deterministic: bool):
        b, n, _ = x.shape
        hd = self.dim // self.heads
        qkv = nn.Dense(3 * self.dim, use_bias=False, kernel_init=he_normal,
                       name="to_qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scores = jnp.einsum("bnhc,bmhc->bhnm", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores * (hd ** -0.5)
        attn = nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhnm,bmhc->bnhc", attn.astype(v.dtype), v)
        out = out.reshape(b, n, self.dim)
        out = nn.Dense(self.dim, kernel_init=he_normal, name="to_out")(out)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


class DenseFF(nn.Module):
    hidden: int
    out: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, deterministic: bool):
        y = nn.Dense(self.hidden, kernel_init=he_normal, name="fc1")(x)
        y = nn.gelu(y, approximate=False)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        y = nn.Dense(self.out, kernel_init=he_normal, name="fc2")(y)
        return nn.Dropout(self.dropout)(y, deterministic=deterministic)


class DenseAttnBlock(nn.Module):
    """DensePreConv_AttentionBlock: densely-growing token features."""

    out_channels: int
    growth_rate: int = 32
    depth: int = 4
    heads: int = 8
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, deterministic: bool):
        g = self.growth_rate
        features = [x]
        for i in range(self.depth):
            h = jnp.concatenate(features, axis=-1)
            h = nn.Dense(g, kernel_init=he_normal, name=f"reduce_{i}")(h)
            a = LayerNorm(eps=1e-5, name=f"attn_norm_{i}")(h)
            h = MHA(g, self.heads, self.dropout,
                    name=f"attn_{i}")(a, deterministic) + h
            ffn = DenseFF(2 * g, g, self.dropout, name=f"ff_{i}")
            ffn_norm = LayerNorm(eps=1e-5, name=f"ff_norm_{i}")
            h = ffn(ffn_norm(h), deterministic) + h
            # reference quirk: the appended feature is a SECOND pass of the
            # same (pre-normed) FFN applied to the block output.
            features.append(ffn(ffn_norm(h), deterministic))
        h = jnp.concatenate(features, axis=-1)
        return DenseFF(2 * g, self.out_channels, self.dropout,
                       name="out_layer")(h, deterministic)


class DenseTransformerBranch(nn.Module):
    out_channels: int
    depth: int = 6
    growth_rate: int = 32
    patch: int = 16
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, deterministic: bool):
        p = self.patch
        b, d, h, w, _ = x.shape
        grid = (d // p, h // p, w // p)
        y = Conv3d(self.out_channels, p, stride=p, padding=0,
                   name="patch_embed")(x)
        n = grid[0] * grid[1] * grid[2]
        y = y.reshape(b, n, self.out_channels)
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, n, self.out_channels))
        y = nn.Dropout(self.dropout)(y + pos, deterministic=deterministic)
        for i in range(self.depth):
            y = DenseAttnBlock(self.out_channels, self.growth_rate,
                               name=f"block_{i}")(y, deterministic)
        return y.reshape(b, *grid, self.out_channels)


class BasicConv(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        y = Conv3d(self.features, 3, use_bias=False, name="conv")(x)
        y = GroupNorm(num_groups=self.features, name="norm")(y)  # IN+affine
        return nn.relu(y)


class UpConvHD(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        y = Conv3d(self.features, 3, name="conv")(x)
        y = InstanceNorm()(y)
        y = nn.relu(y)
        import jax
        return jax.image.resize(
            y, (y.shape[0], *[2 * s for s in y.shape[1:4]], y.shape[-1]),
            method="trilinear")


class TransposeUp(nn.Module):
    """ConvTranspose k=3 s=2 p=1 output_padding=1 → exact 2×."""

    features: int

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kernel = self.param("kernel", he_normal,
                            (3, 3, 3, in_ch, self.features))
        y = lax.conv_general_dilated(
            x, jnp.flip(kernel, axis=(0, 1, 2)).astype(x.dtype),
            window_strides=(1, 1, 1),
            padding=[(1, 2)] * 3,      # k-1-p = 1, +output_padding at end
            lhs_dilation=(2, 2, 2),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return y + b.astype(y.dtype)


class HDenseFormer(nn.Module):
    in_channels: int = 2
    n_cls: int = 2
    n_filters: int = 16
    transformer_depth: int = 24

    @nn.compact
    def __call__(self, x, train: bool = False, deterministic=None):
        # ``deterministic`` overrides dropout separately from the output
        # structure (torch semantics: .eval() model still returns all 4
        # deep heads; used by the torch-parity tests).
        det = (not train) if deterministic is None else deterministic
        nf = self.n_filters
        branches = []
        for m in range(self.in_channels):
            branches.append(DenseTransformerBranch(
                4 * nf, depth=self.transformer_depth // 4,
                name=f"attns_{m}")(x[..., m:m + 1], det))
        attnall = jnp.concatenate(branches, axis=-1)
        attnout = UpConvHD(8 * nf, name="deep_conv")(attnall)   # 1/8
        at1 = UpConvHD(4 * nf, name="up1")(attnout)             # 1/4
        at2 = UpConvHD(2 * nf, name="up2")(at1)                 # 1/2
        at3 = UpConvHD(nf, name="up3")(at2)                     # 1/1

        ds0 = BasicConv(nf, name="b11l")(x)
        ds0 = BasicConv(nf, name="b12l")(ds0) + at3
        ds1 = BasicConv(2 * nf, name="b21l")(max_pool3d(ds0, 2))
        ds1 = BasicConv(2 * nf, name="b22l")(ds1) + at2
        ds2 = BasicConv(4 * nf, name="b31l")(max_pool3d(ds1, 2))
        ds2 = BasicConv(4 * nf, name="b32l")(ds2) + at1
        h = BasicConv(8 * nf, name="b41l")(max_pool3d(ds2, 2))
        h = BasicConv(8 * nf, name="b42l")(h) + attnout

        out3 = nn.Dense(self.n_cls, kernel_init=he_normal,
                        name="head_d3")(h)
        h = jnp.concatenate([TransposeUp(4 * nf, name="upconv3")(h), ds2],
                            axis=-1)
        h = BasicConv(4 * nf, name="b32r")(BasicConv(4 * nf,
                                                     name="b31r")(h))
        out2 = nn.Dense(self.n_cls, kernel_init=he_normal,
                        name="head_d2")(h)
        h = jnp.concatenate([TransposeUp(2 * nf, name="upconv2")(h), ds1],
                            axis=-1)
        h = BasicConv(2 * nf, name="b22r")(BasicConv(2 * nf,
                                                     name="b21r")(h))
        out1 = nn.Dense(self.n_cls, kernel_init=he_normal,
                        name="head_d1")(h)
        h = jnp.concatenate([TransposeUp(nf, name="upconv1")(h), ds0],
                            axis=-1)
        h = BasicConv(nf, name="b12r")(BasicConv(nf, name="b11r")(h))
        out0 = nn.Dense(self.n_cls, kernel_init=he_normal, name="head")(h)

        full = out0.shape[1:4]
        outs = [out0] + [
            resize_trilinear(o, full) for o in (out1, out2, out3)]
        if train:
            return outs
        return outs[0]


@register_model("HDense")
def build_hdense(cfg: dict) -> HDenseFormer:
    return HDenseFormer(in_channels=cfg.get("in_channels", 2),
                        n_cls=cfg.get("n_cls", 2),
                        n_filters=16,
                        transformer_depth=cfg.get("transformer_depth", 24))
