"""VeloxSeg top-level model (channels-last, TPU-native).

Wires the dual-branch :class:`Encoder`, the student :class:`SegDecoder` and
per-modality teacher :class:`RCDecoder`\\ s. Reference: ``model/VeloxSeg.py``.

Output contract (training, matching ``model/VeloxSeg.py:195-221`` /
``utils/runtime.py:158-174``):

    ``[*seg_preds, recons, student_gram, *teacher_grams]``

where ``seg_preds`` are deep-supervision logits all upsampled to input size
(trilinear, align_corners=True), ``recons`` is the channel-concat of the
per-modality reconstructions, and the grams are ``(B, C, C)`` SDKT
statistics. Eval mode returns seg logits only.
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..core.config import VeloxSegConfig
from ..ops import packed_conv
from ..ops.resize import resize_trilinear
from .decoder import RCDecoder, SegDecoder
from .encoder import Encoder


class VeloxSeg(nn.Module):
    cfg: VeloxSegConfig
    # Training-only layout optimization: emit the two pixel-shuffle heads
    # (seg head 0, reconstructions) in patch-BLOCKED form (B, G³, p³·C) —
    # CE/Dice/MSE are voxel-wise sums, so CompositeLoss(blocked_scale=p)
    # computes identical values while the full-resolution narrow-channel
    # shuffle transposes (fwd + bwd) disappear from the train step. Eval
    # output and the deep-supervision heads are unchanged.
    train_blocked_heads: bool = False

    def _scale_prediction(self, pred: jnp.ndarray) -> jnp.ndarray:
        return resize_trilinear(pred, self.cfg.input_size,
                                spatial_axes=(1, 2, 3))

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        cfg = self.cfg
        deterministic = not train
        encoder = Encoder(
            input_size=cfg.input_size,
            patch_size=cfg.patch_size,
            in_ch=cfg.in_ch,
            base_ch=cfg.base_ch,
            conv_depths=cfg.conv_depths,
            kernel_sizes=cfg.kernel_sizes,
            min_dim_group=cfg.min_dim_group,
            conv_expansion_factor=cfg.conv_expansion_factor,
            attn_base_ch=cfg.attn_base_ch,
            depths=cfg.depths,
            min_big_window_sizes=cfg.min_big_window_sizes,
            min_small_window_sizes=cfg.min_small_window_sizes,
            min_dim_head=cfg.min_dim_head,
            scale_factors=cfg.scale_factors,
            num_heads=cfg.num_heads,
            attn_drop=cfg.attn_drop,
            proj_drop=cfg.proj_drop,
            drop_path=cfg.drop_path,
            ffn_expansion_ratio=cfg.ffn_expansion_ratio,
            act_layer=cfg.act_layer,
            patch_norm=cfg.patch_norm,
            qkv_bias=cfg.qkv_bias,
            conv_drop=cfg.conv_drop,
            name="encoder",
        )
        attn_feats, encs, attn_packed, enc_packed = encoder(
            x, deterministic)

        blocked = bool(self.train_blocked_heads and train)
        decoder = SegDecoder(
            patch_size=cfg.patch_size,
            base_ch=cfg.base_ch,
            out_ch=cfg.n_classes,
            depths=cfg.conv_depths,
            kernel_sizes=cfg.kernel_sizes,
            min_dim_group=cfg.min_dim_group,
            expansion_factor=cfg.conv_expansion_factor,
            dropout=cfg.conv_drop,
            deep_supervision=cfg.deep_supervision,
            blocked_head=blocked,
            name="decoder",
        )
        preds, dec_gram = decoder(encs, deterministic, packed=enc_packed)

        if not train:
            return preds[0]

        # head 0 is already full-resolution (blocked or shuffled); only
        # the coarse deep-supervision heads upsample
        preds = [preds[0]] + [self._scale_prediction(p)
                              for p in preds[1:]]

        rcs = []
        rc_grams = []
        for m in range(cfg.num_modalities):
            rc_dec = RCDecoder(
                in_channel=cfg.in_ch[m],
                dec_channel=cfg.base_ch,
                patch_size=cfg.patch_size,
                depths=cfg.conv_depths,
                kernel_sizes=cfg.kernel_sizes,
                min_dim_group=cfg.min_dim_group,
                expansion_factor=cfg.conv_expansion_factor,
                dropout=cfg.conv_drop,
                blocked_head=blocked,
                name=f"rc_decoder_{m}",
            )
            # Teachers see both branches: concat(attn_m, fused enc) per level
            # (``model/VeloxSeg.py:211-212``). Levels stay in the packed
            # layout where the conv pyramid is packed; the attention
            # feature joins in matching form (packed concat carries the
            # per-source logical channel splits for the adapter Dense).
            ins, rc_packed, rc_splits = [], [], []
            for lvl in range(cfg.num_levels):
                a, e = attn_feats[lvl][m], encs[lvl]
                ca = cfg.attn_base_ch * 2 ** lvl
                ce = cfg.base_ch * 2 ** lvl
                if enc_packed[lvl]:
                    if not attn_packed[lvl]:
                        a = packed_conv.pack_s2d(a)
                    ins.append(jnp.concatenate([a, e], axis=-1))
                    rc_packed.append(True)
                    rc_splits.append((ca, ce))
                else:
                    if attn_packed[lvl]:
                        a = packed_conv.unpack_s2d(a, ca)
                    ins.append(jnp.concatenate([a, e], axis=-1))
                    rc_packed.append(False)
                    rc_splits.append(None)
            rc, rc_gram = rc_dec(ins, deterministic, packed=rc_packed,
                                 splits=rc_splits)
            rcs.append(rc)
            rc_grams.append(rc_gram)
        recons = jnp.concatenate(rcs, axis=-1)

        return list(preds) + [recons] + [dec_gram] + rc_grams


def build_veloxseg(model_config: dict) -> Tuple[VeloxSeg, VeloxSegConfig]:
    """Build from a reference-format model-config dict (JSON)."""
    cfg = VeloxSegConfig.from_dict(model_config)
    return VeloxSeg(cfg), cfg
