"""Student (segmentation) and teacher (reconstruction) decoders.

Reference: ``model/Decoder.py``. Channels-last.

Both decoders consume the encoder's feature pyramid in 2×2×2-packed
parity-major form wherever the level's geometry allows it (``packed``
flags from :class:`~veloxseg_tpu.nn.encoder.Encoder`): the ×2 UpConv
maps packed→packed with a single per-parity matmul (no pixel shuffle,
no narrow-minor tensors), skips add in the packed layout, JLC layers run
packed-io, and only the deep-supervision heads / the full-resolution
output head unpack (cheap, coarse / unavoidable respectively).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops import packed_conv
from ..ops.gram import gram_matrix
from ..ops.pixel_shuffle import pixel_shuffle_3d
from . import pwa_packed
from .basic import DenseParams, GroupedConv3d, he_normal
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
    def __call__(self, encs, deterministic: bool, packed=None):
        """``encs`` is the per-level feature pyramid, finest first;
        ``packed[i]`` says level i arrives as a packed stream.

        Generalized to ``len(encs)`` levels; for the reference 4-level
        configuration the parameter names (``up{1..3}``, ``layer{1..3}``,
        ``out_conv{1..4}``) match the reference modules one-to-one.
        """
        num_levels = len(encs)
        if packed is None:
            packed = [False] * num_levels
        c = self.base_ch
        groups = [c * 2 ** i // self.min_dim_group[i]
                  for i in range(num_levels)]

        def jlc(i, pk):
            return JLCLayer(depth=self.depths[i],
                            kernel_sizes=self.kernel_sizes,
                            groups=groups[i],
                            expansion_factor=self.expansion_factor[i],
                            dropout=self.dropout, packed_io=pk,
                            name=f"layer{i + 1}")

        # Up path: level L-1 feature → … → level-1 feature. ``feats[t]`` is
        # the decoded feature at (1-indexed) level t, unpacked, and only
        # materialized where a deep-supervision head needs it; feats[L] is
        # the raw deepest encoder output (``model/Decoder.py:158``).
        def unpacked(v, level_idx):
            return (packed_conv.unpack_s2d(v, c * 2 ** level_idx)
                    if packed[level_idx] else v)

        feats = {num_levels: unpacked(encs[-1], num_levels - 1)}
        h = encs[-1]
        h_packed = packed[-1]
        h1_packed = None
        for t in range(num_levels - 1, 0, -1):
            tgt = packed[t - 1] or _stage_packable(encs[t - 1],
                                                   self.kernel_sizes)
            up = UpConv(c * 2 ** (t - 1), packed_in=h_packed,
                        packed_out=tgt, name=f"up{t}")(h)
            if tgt:
                skip = (encs[t - 1] if packed[t - 1]
                        else packed_conv.pack_s2d(encs[t - 1]))
                hp = jlc(t - 1, True)(skip + up, deterministic)
                h, h_packed = hp, True
                if t == 1:
                    h1_packed = hp
                elif self.deep_supervision:
                    feats[t] = packed_conv.unpack_s2d(hp, c * 2 ** (t - 1))
            else:
                skip = (packed_conv.unpack_s2d(encs[t - 1],
                                               c * 2 ** (t - 1))
                        if packed[t - 1] else encs[t - 1])
                h = jlc(t - 1, False)(skip + up, deterministic)
                h_packed = False
                feats[t] = h

        p = self.patch_size
        if h1_packed is not None:
            # gram straight off the packed stream; the head conv runs
            # unpacked (a k=3-only conv inflates 8× in packed space —
            # only half the (tap, parity) kernel slots are nonzero)
            gram = packed_conv.gram_matrix_packed(h1_packed, c)
            feats[1] = packed_conv.unpack_s2d(h1_packed, c)
        else:
            gram = gram_matrix(h)
            feats[1] = h
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
    Returns ``(recon, gram)``. Packed levels arrive as the channel concat
    of two packed streams — ``splits`` gives the logical channel counts so
    the adapter Dense can expand per source block.
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
    def __call__(self, encs, deterministic: bool, packed=None,
                 splits=None):
        """``encs``: per-level concat(attn_m, fused enc), finest first."""
        num_levels = len(encs)
        if packed is None:
            packed = [False] * num_levels
        c = self.dec_channel

        def adapt(x, i):
            mult = 2 ** i
            name = f"enc2rc_{i + 1}"
            if packed[i]:
                cin = x.shape[-1] // 8
                kern, bias = DenseParams(c * mult, cin, name=name)()
                big = (pwa_packed.concat_parity(kern, list(splits[i]))
                       if splits and splits[i] else
                       pwa_packed.dense_parity(kern))
                y = x @ big.astype(x.dtype)
                y = y + pwa_packed.tile8(bias).astype(y.dtype)
                return packed_conv.instance_norm_packed(y, c * mult)
            y = nn.Dense(c * mult, kernel_init=he_normal, name=name)(x)
            return InstanceNorm()(y)

        encs = [adapt(encs[i], i) for i in range(num_levels)]

        groups = [c * 2 ** i // self.min_dim_group[i]
                  for i in range(num_levels)]

        def jlc(i, pk):
            return JLCLayer(depth=self.depths[i],
                            kernel_sizes=self.kernel_sizes,
                            groups=groups[i],
                            expansion_factor=self.expansion_factor[i],
                            dropout=self.dropout, packed_io=pk,
                            name=f"layer{i + 1}")

        h = encs[-1]
        h_packed = packed[-1]
        h1_packed = None
        for t in range(num_levels - 1, 0, -1):
            tgt = packed[t - 1] or _stage_packable(encs[t - 1],
                                                   self.kernel_sizes)
            up = UpConv(c * 2 ** (t - 1), packed_in=h_packed,
                        packed_out=tgt, name=f"up{t}")(h)
            if tgt:
                skip = (encs[t - 1] if packed[t - 1]
                        else packed_conv.pack_s2d(encs[t - 1]))
                hp = jlc(t - 1, True)(skip + up, deterministic)
                h, h_packed = hp, True
                if t == 1:
                    h1_packed = hp
            else:
                skip = (packed_conv.unpack_s2d(encs[t - 1],
                                               c * 2 ** (t - 1))
                        if packed[t - 1] else encs[t - 1])
                h = jlc(t - 1, False)(skip + up, deterministic)
                h_packed = False

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
