"""BasicUNet — the reference's "UNet" baseline.

The reference registers MONAI ``BasicUNet`` (``utils/load_model.py:10-12``)
with default features (32, 32, 64, 128, 256, 32): TwoConv stem, 4×
(maxpool + TwoConv) encoder, 4× (deconv-upsample + concat-skip + TwoConv)
decoder, 1×1 head. Convolution blocks are conv3³ → InstanceNorm(affine) →
LeakyReLU(0.1).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...nn.basic import he_normal
from ...nn.conv_blocks import UpConv  # not used; kept minimal imports
from ..registry import register_model
from .common import Conv3d, ConvTranspose3d, GroupNorm, max_pool3d


class TwoConv(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        for i in range(2):
            x = Conv3d(self.features, 3, name=f"conv_{i}")(x)
            x = GroupNorm(num_groups=x.shape[-1], name=f"norm_{i}")(x)
            x = nn.leaky_relu(x, negative_slope=0.1)
        return x


class BasicUNet(nn.Module):
    out_channels: int = 2
    features: Tuple[int, ...] = (32, 32, 64, 128, 256, 32)

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.features
        x0 = TwoConv(f[0], name="conv_0")(x)
        x1 = TwoConv(f[1], name="down_1")(max_pool3d(x0, 2))
        x2 = TwoConv(f[2], name="down_2")(max_pool3d(x1, 2))
        x3 = TwoConv(f[3], name="down_3")(max_pool3d(x2, 2))
        x4 = TwoConv(f[4], name="down_4")(max_pool3d(x3, 2))

        def upcat(xin, skip, up_ch, out_ch, name):
            up = ConvTranspose3d(up_ch, 2, 2, name=f"{name}_deconv")(xin)
            cat = jnp.concatenate([skip, up], axis=-1)
            return TwoConv(out_ch, name=f"{name}_convs")(cat)

        u4 = upcat(x4, x3, f[4] // 2, f[3], "upcat_4")
        u3 = upcat(u4, x2, f[3] // 2, f[2], "upcat_3")
        u2 = upcat(u3, x1, f[2] // 2, f[1], "upcat_2")
        # last UpCat keeps channels (halves=False in MONAI).
        up = ConvTranspose3d(f[1], 2, 2, name="upcat_1_deconv")(u2)
        u1 = TwoConv(f[5], name="upcat_1_convs")(
            jnp.concatenate([x0, up], axis=-1))

        return nn.Dense(self.out_channels, kernel_init=he_normal,
                        name="final_conv")(u1)


@register_model("UNet")
def build_unet(cfg: dict) -> BasicUNet:
    return BasicUNet(out_channels=cfg.get("out_channels", 2),
                     features=tuple(cfg.get("features",
                                            (32, 32, 64, 128, 256, 32))))
