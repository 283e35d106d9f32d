"""VNet baseline (reference registers MONAI ``VNet``,
``utils/load_model.py:14-16``).

Classic VNet: 5³ conv blocks with ELU, stride-2 down convs
(16→32→64→128→256 with 1/2/3/2 convs per stage), transpose-conv up path
with concat skips and residual adds, channel dropout on the two deepest
stages. Documented delta: the reference's BatchNorm3d is realized as
batch-statistics normalization without running stats
(:class:`common.BatchNormNoTrack`) — the framework is stateless by design.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...nn.basic import he_normal
from ..registry import register_model
from .common import BatchNormNoTrack, ChannelDropout, Conv3d, ConvTranspose3d


class LUConv(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        x = Conv3d(self.features, 5, name="conv")(x)
        x = BatchNormNoTrack(name="bn")(x)
        return nn.elu(x)


class InputTransition(nn.Module):
    features: int = 16

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        y = Conv3d(self.features, 5, name="conv")(x)
        y = BatchNormNoTrack(name="bn")(y)
        if self.features % in_ch == 0:
            rep = jnp.tile(x, (1,) * (x.ndim - 1) + (self.features // in_ch,))
            y = y + rep
        return nn.elu(y)


class DownTransition(nn.Module):
    features: int
    nconvs: int
    dropout: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool):
        down = Conv3d(self.features, 2, stride=2, padding=0,
                      name="down_conv")(x)
        down = nn.elu(BatchNormNoTrack(name="bn")(down))
        y = ChannelDropout(0.5)(down, deterministic) if self.dropout \
            else down
        for i in range(self.nconvs):
            y = LUConv(self.features, name=f"conv_{i}")(y)
        return nn.elu(y + down)


class UpTransition(nn.Module):
    features: int      # output channels (after concat)
    nconvs: int
    dropout: bool = False

    @nn.compact
    def __call__(self, x, skip, deterministic: bool):
        if self.dropout:
            x = ChannelDropout(0.5, name="do_in")(x, deterministic)
        skip = ChannelDropout(0.5, name="do_skip")(skip, deterministic) \
            if self.dropout else skip
        up = ConvTranspose3d(self.features // 2, 2, 2, name="up_conv")(x)
        up = nn.elu(BatchNormNoTrack(name="bn")(up))
        cat = jnp.concatenate([up, skip], axis=-1)
        y = cat
        for i in range(self.nconvs):
            y = LUConv(self.features, name=f"conv_{i}")(y)
        return nn.elu(y + cat)


class VNet(nn.Module):
    out_channels: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        det = not train
        x16 = InputTransition(16, name="in_tr")(x)
        x32 = DownTransition(32, 1, name="down_tr32")(x16, det)
        x64 = DownTransition(64, 2, name="down_tr64")(x32, det)
        x128 = DownTransition(128, 3, dropout=True,
                              name="down_tr128")(x64, det)
        x256 = DownTransition(256, 2, dropout=True,
                              name="down_tr256")(x128, det)
        u256 = UpTransition(256, 2, dropout=True,
                            name="up_tr256")(x256, x128, det)
        u128 = UpTransition(128, 2, dropout=True,
                            name="up_tr128")(u256, x64, det)
        u64 = UpTransition(64, 1, name="up_tr64")(u128, x32, det)
        u32 = UpTransition(32, 1, name="up_tr32")(u64, x16, det)
        y = Conv3d(self.out_channels, 5, name="out_conv")(u32)
        y = nn.elu(BatchNormNoTrack(name="out_bn")(y))
        return nn.Dense(self.out_channels, kernel_init=he_normal,
                        name="out_proj")(y)


@register_model("VNet")
def build_vnet(cfg: dict) -> VNet:
    return VNet(out_channels=cfg.get("out_channels", 2))
