"""SegFormer3D baseline.

Reference: ``compared_model/SegFormer/SegFormer.py`` — MixVisionTransformer
encoder (overlapping patch embeds k=7/3 s=4/2, spatial-reduction
attention with the reference's ``/sqrt(num_heads)`` score scaling quirk,
mix-FFN with depthwise conv + BN) and the all-MLP decoder head (per-level
linear embed + LN, half-pixel trilinear upsample to 1/4 scale, 1×1 fuse +
BN + ReLU, 4× upsample of logits).
"""

from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...nn.basic import he_normal
from ...nn.norms import LayerNorm
from ..registry import register_model
from .common import BatchNormNoTrack, Conv3d


def _resize_halfpixel(x, size):
    """Trilinear align_corners=False resize on (B, D, H, W, C)."""
    return jax.image.resize(
        x, (x.shape[0], *size, x.shape[-1]), method="trilinear")


class SRAttention(nn.Module):
    embed_dim: int
    num_heads: int
    sr_ratio: int

    @nn.compact
    def __call__(self, x, deterministic: bool):
        b, d, h, w, c = x.shape
        hd = self.embed_dim // self.num_heads
        # qkv_bias=True — MixVisionTransformer builds every block so
        # (``SegFormer.py:354`` etc.).
        q = nn.Dense(self.embed_dim, name="query")(x)
        q = q.reshape(b, d * h * w, self.num_heads, hd)
        src = x
        if self.sr_ratio > 1:
            src = Conv3d(self.embed_dim, self.sr_ratio,
                         stride=self.sr_ratio, padding=0, name="sr")(x)
            src = LayerNorm(eps=1e-5, name="sr_norm")(src)
        kv = nn.Dense(2 * self.embed_dim, name="key_value")(src)
        m = math.prod(src.shape[1:4])
        kv = kv.reshape(b, m, 2, self.num_heads, hd)
        k, v = kv[:, :, 0], kv[:, :, 1]
        # Reference quirk: scores scaled by sqrt(num_heads), not head_dim.
        scores = jnp.einsum("bnhc,bmhc->bhnm", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / math.sqrt(self.num_heads)
        attn = nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhnm,bmhc->bnhc", attn.astype(v.dtype), v)
        out = out.reshape(b, d, h, w, self.embed_dim)
        return nn.Dense(self.embed_dim, kernel_init=he_normal,
                        name="proj")(out)


class MixFFN(nn.Module):
    embed_dim: int
    mlp_ratio: int = 4

    @nn.compact
    def __call__(self, x, deterministic: bool):
        hidden = self.embed_dim * self.mlp_ratio
        y = nn.Dense(hidden, kernel_init=he_normal, name="fc1")(x)
        y = Conv3d(hidden, 3, groups=hidden, name="dwconv")(y)
        y = BatchNormNoTrack(name="bn")(y)
        y = nn.gelu(y, approximate=False)
        return nn.Dense(self.embed_dim, kernel_init=he_normal,
                        name="fc2")(y)


class SegFormer3D(nn.Module):
    num_classes: int = 3
    sr_ratios: Tuple[int, ...] = (4, 2, 1, 1)
    embed_dims: Tuple[int, ...] = (32, 64, 160, 256)
    patch_kernel_size: Tuple[int, ...] = (7, 3, 3, 3)
    patch_stride: Tuple[int, ...] = (4, 2, 2, 2)
    patch_padding: Tuple[int, ...] = (3, 1, 1, 1)
    mlp_ratios: Tuple[int, ...] = (4, 4, 4, 4)
    num_heads: Tuple[int, ...] = (1, 2, 5, 8)
    depths: Tuple[int, ...] = (2, 2, 2, 2)
    decoder_dim: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        det = not train
        feats = []
        for s in range(4):
            x = Conv3d(self.embed_dims[s], self.patch_kernel_size[s],
                       stride=self.patch_stride[s],
                       padding=self.patch_padding[s],
                       name=f"embed_{s}")(x)
            x = LayerNorm(eps=1e-5, name=f"embed_norm_{s}")(x)
            for i in range(self.depths[s]):
                h = LayerNorm(eps=1e-5, name=f"s{s}_b{i}_norm1")(x)
                x = x + SRAttention(self.embed_dims[s], self.num_heads[s],
                                    self.sr_ratios[s],
                                    name=f"s{s}_b{i}_attn")(h, det)
                h = LayerNorm(eps=1e-5, name=f"s{s}_b{i}_norm2")(x)
                x = x + MixFFN(self.embed_dims[s], self.mlp_ratios[s],
                               name=f"s{s}_b{i}_mlp")(h, det)
            x = LayerNorm(eps=1e-5, name=f"stage_norm_{s}")(x)
            feats.append(x)

        c1, c2, c3, c4 = feats
        tgt = c1.shape[1:4]
        parts = []
        for name, c in (("linear_c4", c4), ("linear_c3", c3),
                        ("linear_c2", c2), ("linear_c1", c1)):
            y = nn.Dense(self.decoder_dim, kernel_init=he_normal,
                         name=name)(c)
            y = LayerNorm(eps=1e-5, name=f"{name}_norm")(y)
            if y.shape[1:4] != tgt:
                y = _resize_halfpixel(y, tgt)
            parts.append(y)
        fused = jnp.concatenate(parts, axis=-1)
        fused = nn.Dense(self.decoder_dim, use_bias=False,
                         kernel_init=he_normal, name="linear_fuse")(fused)
        fused = nn.relu(BatchNormNoTrack(name="fuse_bn")(fused))
        logits = nn.Dense(self.num_classes, kernel_init=he_normal,
                          name="linear_pred")(fused)
        full = tuple(t * 4 for t in tgt)
        return _resize_halfpixel(logits, full)


@register_model("SegFormer")
def build_segformer3d(cfg: dict) -> SegFormer3D:
    return SegFormer3D(num_classes=cfg.get("num_classes", 3))
