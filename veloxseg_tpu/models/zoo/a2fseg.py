"""A2FSeg baseline — modality-adaptive fusion nnU-Net
(``compared_model/A2FSeg/.../generic_MAML3_channel.py:722``).

Per-modality nnU-Net encoders/decoders (conv-BN-LeakyReLU pairs,
convolutional pooling/upsampling, channels 16·2^d capped at 320, deep
supervision at every decoder scale), a fusion decoder whose skip inputs
are the modality decoders' mean features at each level, and a
modality-adaptive attention head (per-modality conv blocks → softmax over
modalities → weighted feature sum fused with the fusion-decoder feature).

Output contract (train): ``[fused_logits, *modality1_deep5,
*modality2_deep5, ..., *fusion_deep5]``, all trilinear-upsampled to input
size with align_corners — the reference's ``1 + N·5`` grouping consumed by
``a2fseg_deep_output_groups`` (``utils/runtime.py:147``). Eval returns the
fused logits. The reference's modality-subset dropping machinery
(``SUBSETS_MODALITIES``) defaults to the full set; this port always uses
all modalities.
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...nn.basic import he_normal
from ...ops.resize import resize_trilinear
from ..registry import register_model
from .common import BatchNormNoTrack, Conv3d, ConvTranspose3d


def _stage_channels(base: int, num_pool: int, cap: int = 320) -> List[int]:
    return [min(base * 2 ** d, cap) for d in range(num_pool + 1)]


class ConvBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        y = Conv3d(self.features, 3, stride=self.stride, name="conv")(x)
        y = BatchNormNoTrack(name="norm")(y)
        return nn.leaky_relu(y, 0.01)


class NNUNetEncoder(nn.Module):
    base: int
    num_pool: int

    @nn.compact
    def __call__(self, x):
        chs = _stage_channels(self.base, self.num_pool)
        skips = []
        for d in range(self.num_pool):
            stride = 1 if d == 0 else 2
            x = ConvBlock(chs[d], stride, name=f"ctx{d}_a")(x)
            x = ConvBlock(chs[d], 1, name=f"ctx{d}_b")(x)
            skips.append(x)
        x = ConvBlock(chs[-1], 2, name="bottleneck_a")(x)
        x = ConvBlock(chs[-1], 1, name="bottleneck_b")(x)
        return x, skips


class NNUNetDecoder(nn.Module):
    """Decoder over (bottleneck, skips); emits per-stage features + segs."""

    base: int
    num_pool: int
    num_classes: int

    @nn.compact
    def __call__(self, x, skips):
        chs = _stage_channels(self.base, self.num_pool)
        feats = []
        segs = []
        for u in range(self.num_pool):
            skip_ch = chs[self.num_pool - 1 - u]
            x = ConvTranspose3d(skip_ch, 2, 2, use_bias=False,
                                name=f"tu{u}")(x)
            x = jnp.concatenate([x, skips[-(u + 1)]], axis=-1)
            x = ConvBlock(skip_ch, 1, name=f"loc{u}_a")(x)
            x = ConvBlock(skip_ch, 1, name=f"loc{u}_b")(x)
            feats.append(x)
            # final_nonlin: the reference SOFTMAXES every deep seg head
            # (Generic_UNet.forward ``self.final_nonlin(...)``); only the
            # top-level fused output stays raw logits.
            segs.append(nn.softmax(
                nn.Dense(self.num_classes, use_bias=False,
                         kernel_init=he_normal,
                         name=f"seg{u}")(x), axis=-1))
        # reference deep order: [seg_full, lower scales high→low res]
        deep = [segs[-1]] + segs[:-1][::-1]
        return x, deep, feats


class A2FSeg(nn.Module):
    modality_num: int = 2
    base: int = 16
    num_classes: int = 2
    num_pool: int = 5

    @nn.compact
    def __call__(self, x, train: bool = False):
        full = x.shape[1:4]
        mods = [x[..., m:m + 1] for m in range(self.modality_num)]

        modality_feats = []     # full-res feature maps (base ch)
        deep_outputs = []
        fusion_levels = None    # running per-level feature stacks
        for m, xm in enumerate(mods):
            bott, skips = NNUNetEncoder(self.base, self.num_pool,
                                        name=f"enc{m}")(xm)
            feat_out, deep, feats = NNUNetDecoder(
                self.base, self.num_pool, self.num_classes,
                name=f"dec{m}")(bott, skips)
            modality_feats.append(feat_out)
            deep_outputs += deep
            levels = [bott] + feats
            if fusion_levels is None:
                fusion_levels = [[f] for f in levels]
            else:
                for lst, f in zip(fusion_levels, levels):
                    lst.append(f)

        # Fusion decoder: skips are the MEAN of modality decoder features.
        mean_levels = [sum(lst) / len(lst) for lst in fusion_levels]
        chs = _stage_channels(self.base, self.num_pool)
        h = mean_levels[0]
        fusion_deep = []
        for u in range(self.num_pool):
            skip_ch = chs[self.num_pool - 1 - u]
            h = ConvTranspose3d(skip_ch, 2, 2, use_bias=False,
                                name=f"fusion_tu{u}")(h)
            h = jnp.concatenate([h, mean_levels[u + 1]], axis=-1)
            h = ConvBlock(skip_ch, 1, name=f"fusion_loc{u}_a")(h)
            h = ConvBlock(skip_ch, 1, name=f"fusion_loc{u}_b")(h)
            fusion_deep.append(nn.softmax(
                nn.Dense(self.num_classes, use_bias=False,
                         kernel_init=he_normal,
                         name=f"fusion_seg{u}")(h), axis=-1))
        fusion_feat = h
        deep_outputs += [fusion_deep[-1]] + fusion_deep[:-1][::-1]

        # Modality-adaptive attention fusion.
        attns = []
        for m in range(self.modality_num):
            a = jnp.concatenate([modality_feats[m], fusion_feat], axis=-1)
            a = ConvBlock(self.base, 1, name=f"aware{m}_a")(a)
            a = Conv3d(self.base, 3, name=f"aware{m}_b")(a)
            attns.append(nn.leaky_relu(a, 0.01))
        attn = nn.softmax(jnp.stack(attns, axis=1), axis=1)
        out = sum(attn[:, m] * modality_feats[m]
                  for m in range(self.modality_num))
        out = ConvBlock(self.base, 1, name="lastconv")(
            jnp.concatenate([out, fusion_feat], axis=-1))
        out = nn.Dense(self.num_classes, use_bias=False,
                       kernel_init=he_normal, name="output")(out)

        outs = [out] + deep_outputs
        outs = [o if o.shape[1:4] == full else resize_trilinear(o, full)
                for o in outs]
        if train:
            return outs
        return outs[0]


@register_model("A2FSeg")
def build_a2fseg(cfg: dict) -> A2FSeg:
    return A2FSeg(modality_num=cfg.get("modality_num", 2),
                  base=cfg.get("base_num_features", 16),
                  num_classes=cfg.get("num_classes", 2),
                  num_pool=cfg.get("num_pool", 5))
