"""MedNeXt-S baseline.

Reference: ``compared_model/MedNeXt`` (``create_mednextv1_small``:
n_channels=32, exp_r=2, kernel=3, block_counts=[2]*9, do_res=True,
do_res_up_down=True, no deep supervision). Block = depthwise k³ conv →
per-channel GroupNorm → 1×1 expand → GELU → 1×1 compress (+residual).
Down/up blocks use stride-2 depthwise (transpose) convs with 1×1 residual
resample; the up path uses the reference's asymmetric front-pad to even
sizes.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...nn.basic import he_normal
from ..registry import register_model
from .common import Conv3d, ConvTranspose3d, GroupNorm


class MedNeXtBlock(nn.Module):
    features: int
    exp_r: int = 2
    kernel_size: int = 3
    do_res: bool = True

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = Conv3d(c, self.kernel_size, groups=c, name="dw")(x)
        y = GroupNorm(num_groups=c, name="norm")(y)
        y = nn.gelu(nn.Dense(c * self.exp_r, kernel_init=he_normal,
                             name="expand")(y), approximate=False)
        y = nn.Dense(self.features, kernel_init=he_normal,
                     name="compress")(y)
        if self.do_res:
            y = y + x
        return y


class MedNeXtDown(nn.Module):
    features: int
    exp_r: int = 2
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = Conv3d(c, self.kernel_size, stride=2, groups=c, name="dw")(x)
        y = GroupNorm(num_groups=c, name="norm")(y)
        y = nn.gelu(nn.Dense(c * self.exp_r, kernel_init=he_normal,
                             name="expand")(y), approximate=False)
        y = nn.Dense(self.features, kernel_init=he_normal,
                     name="compress")(y)
        res = Conv3d(self.features, 1, stride=2, padding=0,
                     name="res")(x)
        return y + res


class MedNeXtUp(nn.Module):
    features: int
    exp_r: int = 2
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = ConvTranspose3d(c, self.kernel_size, 2,
                            padding=self.kernel_size // 2, groups=c,
                            name="dw_up")(x)
        y = GroupNorm(num_groups=c, name="norm")(y)
        y = nn.gelu(nn.Dense(c * self.exp_r, kernel_init=he_normal,
                             name="expand")(y), approximate=False)
        y = nn.Dense(self.features, kernel_init=he_normal,
                     name="compress")(y)
        # Reference pads AFTER the whole block (``blocks.py:186-197``):
        # the norm statistics and the compress conv never see the padded
        # zeros, and the padded border stays exactly zero.
        y = jnp.pad(y, ((0, 0), (1, 0), (1, 0), (1, 0), (0, 0)))
        res = ConvTranspose3d(self.features, 1, 2, name="res")(x)
        res = jnp.pad(res, ((0, 0), (1, 0), (1, 0), (1, 0), (0, 0)))
        return y + res


class MedNeXt(nn.Module):
    n_classes: int = 2
    n_channels: int = 32
    exp_r: int = 2
    kernel_size: int = 3
    block_counts: Tuple[int, ...] = (2,) * 9

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = self.n_channels
        bc = self.block_counts

        def stage(x, ch, count, name):
            for i in range(count):
                x = MedNeXtBlock(ch, self.exp_r, self.kernel_size,
                                 name=f"{name}_{i}")(x)
            return x

        x = nn.Dense(n, kernel_init=he_normal, name="stem")(x)
        r0 = stage(x, n, bc[0], "enc0")
        x = MedNeXtDown(2 * n, self.exp_r, self.kernel_size,
                        name="down0")(r0)
        r1 = stage(x, 2 * n, bc[1], "enc1")
        x = MedNeXtDown(4 * n, self.exp_r, self.kernel_size,
                        name="down1")(r1)
        r2 = stage(x, 4 * n, bc[2], "enc2")
        x = MedNeXtDown(8 * n, self.exp_r, self.kernel_size,
                        name="down2")(r2)
        r3 = stage(x, 8 * n, bc[3], "enc3")
        x = MedNeXtDown(16 * n, self.exp_r, self.kernel_size,
                        name="down3")(r3)
        x = stage(x, 16 * n, bc[4], "bottleneck")
        x = stage(r3 + MedNeXtUp(8 * n, self.exp_r, self.kernel_size,
                                 name="up3")(x), 8 * n, bc[5], "dec3")
        x = stage(r2 + MedNeXtUp(4 * n, self.exp_r, self.kernel_size,
                                 name="up2")(x), 4 * n, bc[6], "dec2")
        x = stage(r1 + MedNeXtUp(2 * n, self.exp_r, self.kernel_size,
                                 name="up1")(x), 2 * n, bc[7], "dec1")
        x = stage(r0 + MedNeXtUp(n, self.exp_r, self.kernel_size,
                                 name="up0")(x), n, bc[8], "dec0")
        return nn.Dense(self.n_classes, kernel_init=he_normal,
                        name="out")(x)


@register_model("MedNeXt")
def build_mednext(cfg: dict) -> MedNeXt:
    return MedNeXt(n_classes=cfg.get("num_classes", 2))
