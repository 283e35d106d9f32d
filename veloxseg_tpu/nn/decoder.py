"""Student (segmentation) and teacher (reconstruction) decoders.

Reference: ``model/Decoder.py``. Channels-last.
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.gram import gram_matrix
from ..ops.pixel_shuffle import pixel_shuffle_3d
from .basic import GroupedConv3d, he_normal
from .conv_blocks import JLCLayer, UpConv
from .norms import InstanceNorm


class SegDecoder(nn.Module):
    """Segmentation (student) decoder (``model/Decoder.py:97-179``).

    U-Net-style up path with additive skips; head = 3³ conv to
    ``patch³·n_classes`` + 3-D pixel shuffle; optional deep-supervision 1×1
    heads at the three lower scales. Returns
    ``(preds, gram)`` where ``preds`` is a list of logits (finest first) and
    ``gram`` the Gram matrix of the final feature map (SDKT student
    statistic). In eval mode callers use ``preds[0]`` and discard the rest.
    """

    patch_size: int
    base_ch: int = 32
    out_ch: int = 2
    depths: Tuple[int, ...] = (1, 1, 1, 1)
    kernel_sizes: Tuple[int, ...] = (1, 3, 5)
    min_dim_group: Tuple[int, ...] = (4, 8, 8, 16)
    expansion_factor: Tuple[int, ...] = (3, 3, 2, 2)
    dropout: float = 0.0
    deep_supervision: bool = False

    @nn.compact
    def __call__(self, enc1, enc2, enc3, enc4, deterministic: bool):
        c = self.base_ch
        groups = [c * 2 ** i // self.min_dim_group[i] for i in range(4)]

        def jlc(i):
            return JLCLayer(depth=self.depths[i],
                            kernel_sizes=self.kernel_sizes,
                            groups=groups[i],
                            expansion_factor=self.expansion_factor[i],
                            dropout=self.dropout, name=f"layer{i + 1}")

        up3 = jlc(2)(enc3 + UpConv(c * 4, name="up3")(enc4), deterministic)
        up2 = jlc(1)(enc2 + UpConv(c * 2, name="up2")(up3), deterministic)
        up1 = jlc(0)(enc1 + UpConv(c, name="up1")(up2), deterministic)

        p = self.patch_size
        out = GroupedConv3d(features=p ** 3 * self.out_ch,
                            kernel_size=(3, 3, 3), name="out_conv1")(up1)
        out = pixel_shuffle_3d(out, p)

        preds: List[jnp.ndarray] = [out]
        if self.deep_supervision:
            preds.append(nn.Dense(self.out_ch, kernel_init=he_normal,
                                  name="out_conv2")(up2))
            preds.append(nn.Dense(self.out_ch, kernel_init=he_normal,
                                  name="out_conv3")(up3))
            preds.append(nn.Dense(self.out_ch, kernel_init=he_normal,
                                  name="out_conv4")(enc4))
        return preds, gram_matrix(up1)


class RCDecoder(nn.Module):
    """Reconstruction (teacher) decoder, one per modality
    (``model/Decoder.py:11-94``).

    Inputs are concat(attn_m, fused enc) per level, adapted by 1×1+IN; same
    up path; head reconstructs the modality image via conv + pixel shuffle.
    Returns ``(recon, gram)``.
    """

    in_channel: int
    dec_channel: int
    patch_size: int
    depths: Tuple[int, ...] = (1, 1, 1, 1)
    kernel_sizes: Tuple[int, ...] = (1, 3, 5)
    min_dim_group: Tuple[int, ...] = (4, 8, 8, 16)
    expansion_factor: Tuple[int, ...] = (3, 3, 2, 2)
    dropout: float = 0.0

    @nn.compact
    def __call__(self, enc1, enc2, enc3, enc4, deterministic: bool):
        c = self.dec_channel

        def adapt(x, mult, name):
            y = nn.Dense(c * mult, kernel_init=he_normal, name=name)(x)
            return InstanceNorm()(y)

        enc4 = adapt(enc4, 8, "enc2rc_4")
        enc3 = adapt(enc3, 4, "enc2rc_3")
        enc2 = adapt(enc2, 2, "enc2rc_2")
        enc1 = adapt(enc1, 1, "enc2rc_1")

        groups = [c * 2 ** i // self.min_dim_group[i] for i in range(4)]

        def jlc(i):
            return JLCLayer(depth=self.depths[i],
                            kernel_sizes=self.kernel_sizes,
                            groups=groups[i],
                            expansion_factor=self.expansion_factor[i],
                            dropout=self.dropout, name=f"layer{i + 1}")

        up3 = jlc(2)(enc3 + UpConv(c * 4, name="up3")(enc4), deterministic)
        up2 = jlc(1)(enc2 + UpConv(c * 2, name="up2")(up3), deterministic)
        up1 = jlc(0)(enc1 + UpConv(c, name="up1")(up2), deterministic)

        p = self.patch_size
        rec = GroupedConv3d(features=p ** 3 * self.in_channel,
                            kernel_size=(3, 3, 3), name="out_conv")(up1)
        rec = pixel_shuffle_3d(rec, p)
        return rec, gram_matrix(up1)
