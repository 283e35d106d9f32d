"""Student (segmentation) and teacher (reconstruction) decoders.

Reference: ``model/Decoder.py``. Channels-last.
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops import packed_conv
from ..ops.gram import gram_matrix
from ..ops.pixel_shuffle import pixel_shuffle_3d
from .basic import GroupedConv3d, he_normal
from .conv_blocks import JLCLayer, UpConv
from .norms import InstanceNorm


def _stage_packable(x: jnp.ndarray, kernel_sizes) -> bool:
    return (packed_conv.enabled() and max(kernel_sizes) <= 5
            and all(k % 2 == 1 for k in kernel_sizes)
            and all(s % 2 == 0 for s in x.shape[1:4]))


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
    blocked_head: bool = False   # skip pixel-shuffle: emit (…, p³·out_ch)

    @nn.compact
    def __call__(self, encs, deterministic: bool):
        """``encs`` is the per-level feature pyramid, finest first.

        Generalized to ``len(encs)`` levels; for the reference 4-level
        configuration the parameter names (``up{1..3}``, ``layer{1..3}``,
        ``out_conv{1..4}``) match the reference modules one-to-one.
        """
        num_levels = len(encs)
        c = self.base_ch
        groups = [c * 2 ** i // self.min_dim_group[i]
                  for i in range(num_levels)]

        def jlc(i, packed):
            return JLCLayer(depth=self.depths[i],
                            kernel_sizes=self.kernel_sizes,
                            groups=groups[i],
                            expansion_factor=self.expansion_factor[i],
                            dropout=self.dropout, packed_io=packed,
                            name=f"layer{i + 1}")

        # Up path: level L-1 feature → … → level-1 feature. ``feats[t]`` is
        # the decoded feature at (1-indexed) level t; feats[L] is the raw
        # deepest encoder output (used by the last deep-supervision head,
        # ``model/Decoder.py:158``). Where the grid allows it the level
        # runs as a packed stream: the ×2 UpConv projects STRAIGHT into
        # the packed layout of the finer grid (no pixel shuffle at all),
        # the skip packs once, the JLC does packed-io, and only the
        # deep-supervision heads / next UpConv unpack.
        feats = {num_levels: encs[-1]}
        h = encs[-1]
        h1_packed = None
        for t in range(num_levels - 1, 0, -1):
            packed = _stage_packable(encs[t - 1], self.kernel_sizes)
            up = UpConv(c * 2 ** (t - 1), packed_out=packed,
                        name=f"up{t}")(h)
            if packed:
                hp = jlc(t - 1, True)(
                    packed_conv.pack_s2d(encs[t - 1]) + up, deterministic)
                h = hp if t == 1 else packed_conv.unpack_s2d(
                    hp, c * 2 ** (t - 1))
                if t == 1:
                    h1_packed = hp
                feats[t] = h
            else:
                h = jlc(t - 1, False)(encs[t - 1] + up, deterministic)
                feats[t] = h

        p = self.patch_size
        if h1_packed is not None:
            # gram straight off the packed stream; the head conv runs
            # unpacked (a k=3-only conv inflates 8× in packed space —
            # only half the (tap, parity) kernel slots are nonzero)
            gram = packed_conv.gram_matrix_packed(h1_packed, c)
            feats[1] = packed_conv.unpack_s2d(h1_packed, c)
        else:
            gram = gram_matrix(feats[1])
        out = GroupedConv3d(features=p ** 3 * self.out_ch,
                            kernel_size=(3, 3, 3),
                            name="out_conv1")(feats[1])
        if not self.blocked_head:
            out = pixel_shuffle_3d(out, p)

        preds: List[jnp.ndarray] = [out]
        if self.deep_supervision:
            for t in range(2, num_levels + 1):
                preds.append(nn.Dense(self.out_ch, kernel_init=he_normal,
                                      name=f"out_conv{t}")(feats[t]))
        return preds, gram


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
    blocked_head: bool = False   # skip pixel-shuffle: emit (…, p³·in_ch)

    @nn.compact
    def __call__(self, encs, deterministic: bool):
        """``encs``: per-level concat(attn_m, fused enc), finest first."""
        num_levels = len(encs)
        c = self.dec_channel

        def adapt(x, mult, name):
            y = nn.Dense(c * mult, kernel_init=he_normal, name=name)(x)
            return InstanceNorm()(y)

        encs = [adapt(encs[i], 2 ** i, f"enc2rc_{i + 1}")
                for i in range(num_levels)]

        groups = [c * 2 ** i // self.min_dim_group[i]
                  for i in range(num_levels)]

        def jlc(i, packed):
            return JLCLayer(depth=self.depths[i],
                            kernel_sizes=self.kernel_sizes,
                            groups=groups[i],
                            expansion_factor=self.expansion_factor[i],
                            dropout=self.dropout, packed_io=packed,
                            name=f"layer{i + 1}")

        h = encs[-1]
        h1_packed = None
        for t in range(num_levels - 1, 0, -1):
            packed = _stage_packable(encs[t - 1], self.kernel_sizes)
            up = UpConv(c * 2 ** (t - 1), packed_out=packed,
                        name=f"up{t}")(h)
            if packed:
                hp = jlc(t - 1, True)(
                    packed_conv.pack_s2d(encs[t - 1]) + up, deterministic)
                if t == 1:
                    h1_packed = hp
                    h = hp
                else:
                    h = packed_conv.unpack_s2d(hp, c * 2 ** (t - 1))
            else:
                h = jlc(t - 1, False)(encs[t - 1] + up, deterministic)

        p = self.patch_size
        if h1_packed is not None:
            gram = packed_conv.gram_matrix_packed(h1_packed, c)
            h = packed_conv.unpack_s2d(h1_packed, c)
        else:
            gram = gram_matrix(h)
        rec = GroupedConv3d(features=p ** 3 * self.in_channel,
                            kernel_size=(3, 3, 3), name="out_conv")(h)
        if not self.blocked_head:
            rec = pixel_shuffle_3d(rec, p)
        return rec, gram
