"""U-KAN baseline (``compared_model/UKAN/archs.py:239``).

Conv encoder (double conv+BN+ReLU ×3 with maxpool) → tokenized KAN stages
(overlapping patch embed k=3 s=2 + KAN blocks: three KANLinear layers each
followed by depthwise conv+BN+ReLU) → symmetric decoder with
align-corners trilinear ×2 upsamples, additive skips and KAN blocks on the
two deepest levels.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...nn.basic import he_normal
from ...nn.norms import LayerNorm
from ...ops.resize import resize_trilinear
from ..registry import register_model
from .common import BatchNormNoTrack, Conv3d, max_pool3d
from .kan import KANLinear


class DoubleConv(nn.Module):
    mid: int
    out: int

    @nn.compact
    def __call__(self, x):
        y = Conv3d(self.mid, 3, name="conv1")(x)
        y = nn.relu(BatchNormNoTrack(name="bn1")(y))
        y = Conv3d(self.out, 3, name="conv2")(y)
        return nn.relu(BatchNormNoTrack(name="bn2")(y))


class DWBnRelu(nn.Module):
    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = Conv3d(c, 3, groups=c, name="dw")(x)
        return nn.relu(BatchNormNoTrack(name="bn")(y))


class KANBlock(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        h = LayerNorm(name="norm")(x)
        for i in range(3):
            h = KANLinear(self.dim, name=f"fc{i + 1}")(h)
            h = DWBnRelu(name=f"dw{i + 1}")(h)
        return x + h


class PatchEmbedOverlap(nn.Module):
    embed_dim: int

    @nn.compact
    def __call__(self, x):
        y = Conv3d(self.embed_dim, 3, stride=2, name="proj")(x)
        return LayerNorm(name="norm")(y)


class UKAN(nn.Module):
    num_classes: int = 2
    embed_dims: Tuple[int, ...] = (128, 160, 256)

    @nn.compact
    def __call__(self, x, train: bool = False):
        e = self.embed_dims
        c0 = e[0]

        def up2(y):
            return resize_trilinear(
                y, tuple(2 * s for s in y.shape[1:4]))

        t1 = nn.relu(max_pool3d(DoubleConv(c0 // 8, c0 // 8,
                                           name="encoder1")(x), 2))
        t2 = nn.relu(max_pool3d(DoubleConv(c0 // 4, c0 // 4,
                                           name="encoder2")(t1), 2))
        t3 = nn.relu(max_pool3d(DoubleConv(c0, c0, name="encoder3")(t2), 2))

        h = PatchEmbedOverlap(e[1], name="patch_embed3")(t3)
        h = KANBlock(e[1], name="block1")(h)
        t4 = LayerNorm(name="norm3")(h)

        h = PatchEmbedOverlap(e[2], name="patch_embed4")(t4)
        h = KANBlock(e[2], name="block2")(h)
        h = LayerNorm(name="norm4")(h)

        h = DoubleConv(e[2], e[1], name="decoder1")(h)
        h = nn.relu(up2(h)) + t4
        h = KANBlock(e[1], name="dblock1")(h)
        h = LayerNorm(name="dnorm3")(h)

        h = DoubleConv(e[1], e[0], name="decoder2")(h)
        h = nn.relu(up2(h)) + t3
        h = KANBlock(e[0], name="dblock2")(h)
        h = LayerNorm(name="dnorm4")(h)

        h = nn.relu(up2(DoubleConv(e[0], e[0] // 4, name="decoder3")(h)))
        h = h + t2
        h = nn.relu(up2(DoubleConv(e[0] // 4, e[0] // 8,
                                   name="decoder4")(h)))
        h = h + t1
        h = nn.relu(up2(DoubleConv(e[0] // 8, e[0] // 8,
                                   name="decoder5")(h)))
        return nn.Dense(self.num_classes, kernel_init=he_normal,
                        name="final")(h)


@register_model("U-KAN")
def build_ukan(cfg: dict) -> UKAN:
    return UKAN(num_classes=cfg.get("num_classes", 2),
                embed_dims=tuple(cfg.get("embed_dims", (128, 160, 256))))
