"""Composite training loss.

Parity target: reference ``utils/loss.py`` —
``total = Σ_deep w_i·(CE + Dice) + rc_w·MSE(recon, input) +
feat_w·mean_m MSE(gram_student, gram_teacher_m)``,
with MONAI ``DiceLoss(include_background=False, to_onehot_y=True,
softmax=True)`` semantics (smooth 1e-5 in numerator and denominator) and
special output layouts for A2FSeg / deep-supervised baselines.

All reductions in fp32. Channels-last logits ``(B, *spatial, C)``, integer
labels ``(B, *spatial)``.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from ..utils.runtime import (
    a2fseg_deep_output_groups,
    normalized_deep_loss_weights,
    veloxseg_output_layout,
)


def softmax_ce_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean softmax cross-entropy with integer labels (torch CE parity).

    Uses a dense one-hot contraction rather than ``take_along_axis``: the
    gather's backward is a scatter-add, which is catastrophically slow on
    TPU; the dense form is a fused multiply for the 2-4 class counts here.
    """
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, logits.shape[-1], dtype=jnp.float32)
    return -jnp.mean(jnp.sum(logp * onehot, axis=-1))


def dice_loss(logits: jnp.ndarray, labels: jnp.ndarray,
              include_background: bool = False,
              smooth_nr: float = 1e-5, smooth_dr: float = 1e-5
              ) -> jnp.ndarray:
    """MONAI DiceLoss parity (softmax + onehot target, no background)."""
    n_classes = logits.shape[-1]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    onehot = jax.nn.one_hot(labels, n_classes, dtype=jnp.float32)
    if not include_background:
        probs = probs[..., 1:]
        onehot = onehot[..., 1:]
    axes = tuple(range(1, probs.ndim - 1))
    intersection = jnp.sum(probs * onehot, axis=axes)
    denom = jnp.sum(probs, axis=axes) + jnp.sum(onehot, axis=axes)
    dice = (2.0 * intersection + smooth_nr) / (denom + smooth_dr)
    return jnp.mean(1.0 - dice)


def fused_ce_dice_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                       include_background: bool = False,
                       smooth_nr: float = 1e-5, smooth_dr: float = 1e-5,
                       class_block: int = 1) -> jnp.ndarray:
    """CE + Dice sharing ONE softmax pipeline.

    Numerically identical to ``softmax_ce_loss(...) + dice_loss(...)``
    but reads the (full-resolution, per-deep-head) logits once: the same
    fp32 log-softmax feeds the CE contraction and (via ``exp``) the Dice
    probabilities. The separate-functions form re-materializes softmax
    for every head at every scale — ~30 ms/step of the 128³/bs16 train
    step (device-trace measured).

    ``class_block`` > 1 consumes patch-BLOCKED logits (channel axis =
    (class, block) with class slowest, e.g. an un-shuffled head-conv
    output) against equally blocked labels — per-class slices are then
    contiguous and the math below is unchanged (CE/Dice are voxel-wise
    sums, indifferent to voxel order).
    """
    blk = class_block
    n_classes = logits.shape[-1] // blk
    # Unstack the class axis into per-class full-width tensors: a
    # (B, 128³, 2) fp32 tensor's 2-wide minor axis lane-pads on TPU and
    # every reduce over it runs ~10× under HBM speed (trace-measured
    # ~19 ms/step across the deep heads); per-class (B, 128³) tensors
    # tile cleanly and the whole pipeline fuses.
    if blk > 1:
        xs = [logits[..., c * blk:(c + 1) * blk].astype(jnp.float32)
              for c in range(n_classes)]
    else:
        xs = [logits[..., c].astype(jnp.float32) for c in range(n_classes)]
    m = xs[0]
    for xc in xs[1:]:
        m = jnp.maximum(m, xc)
    exps = [jnp.exp(xc - m) for xc in xs]
    sumexp = sum(exps)
    lse = m + jnp.log(sumexp)
    # CE = mean over voxels of Σ_c 1[label=c]·(lse − x_c) — identical to
    # -mean(Σ log_softmax·onehot) including its treatment of any
    # out-of-range label (contributes 0).
    ce = jnp.mean(sum(jnp.where(labels == c, lse - xc, 0.0)
                      for c, xc in enumerate(xs)))
    axes = tuple(range(1, labels.ndim))
    start = 0 if include_background else 1
    dice_sum = 0.0
    for c in range(start, n_classes):
        probs_c = exps[c] / sumexp
        mask_c = (labels == c)
        inter = jnp.sum(jnp.where(mask_c, probs_c, 0.0), axis=axes)
        denom = (jnp.sum(probs_c, axis=axes)
                 + jnp.sum(mask_c.astype(jnp.float32), axis=axes))
        dice_sum = dice_sum + jnp.mean(
            1.0 - (2.0 * inter + smooth_nr) / (denom + smooth_dr))
    return ce + dice_sum / (n_classes - start)


class CompositeLoss:
    """Callable mirroring reference ``Loss`` (``utils/loss.py:10-86``).

    Stateless and jit-friendly: all configuration is Python-level, all
    inputs are arrays.
    """

    def __init__(self, model_name: str, config, num_modal: int = 2,
                 blocked_scale: int = 0, blocked_in_ch=None):
        self.model_name = model_name
        self.num_modal = num_modal
        self.deep_loss_weight = [float(w) for w in
                                 config["deep_Loss_weight"]]
        self.rc_loss_weight = config.get("RC_Loss_weight")
        self.feature_loss_weight = config.get("Feature_Loss_weight")
        # blocked-heads training (VeloxSeg(train_blocked_heads=True)):
        # head 0 and the reconstructions arrive patch-blocked; labels and
        # the reconstruction target are blocked here once (gradient-free)
        self.blocked_scale = int(blocked_scale)
        self.blocked_in_ch = list(blocked_in_ch or [])

    def seg_loss(self, logits, labels, class_block: int = 1):
        return fused_ce_dice_loss(logits, labels, class_block=class_block)

    def deep_seg_loss(self, outputs: Sequence[jnp.ndarray], labels,
                      blocked_labels=None):
        if not isinstance(outputs, (list, tuple)):
            outputs = [outputs]
        weights = normalized_deep_loss_weights(self.deep_loss_weight,
                                               len(outputs))
        loss = jnp.float32(0.0)
        for i, (w, out) in enumerate(zip(weights, outputs)):
            if i == 0 and blocked_labels is not None:
                loss = loss + w * self.seg_loss(
                    out, blocked_labels, class_block=self.blocked_scale ** 3)
            else:
                loss = loss + w * self.seg_loss(out, labels)
        return loss

    def metric_outputs(self, output) -> List[jnp.ndarray]:
        """Seg-head logits handed to per-head metric reporting.

        Reference-trainer parity (``utils/train_autopet.py:246-254``): for
        VeloxSeg the non-prediction tail (reconstruction + student gram +
        per-modality teacher grams = ``2 + num_modal`` entries) is stripped;
        every other model reports on its raw output list.
        """
        if not isinstance(output, (list, tuple)):
            return [output]
        if self.model_name == "VeloxSeg":
            return list(output[:-(2 + self.num_modal)])
        return list(output)

    def __call__(self, output: List[jnp.ndarray], labels: jnp.ndarray,
                 sr_labels: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        name = self.model_name
        if name == "VeloxSeg":
            layout = veloxseg_output_layout(len(output), self.num_modal)
            s0, s1 = layout["seg"]
            blocked_labels = None
            if self.blocked_scale > 1:
                from ..ops.pixel_shuffle import block_voxels
                s = self.blocked_scale
                blocked_labels = block_voxels(labels, s)
                # reconstruction target blocked per modality so its
                # channel order matches the concat of blocked RC heads
                in_ch = self.blocked_in_ch or [1] * self.num_modal
                parts, c0 = [], 0
                for cm in in_ch:
                    parts.append(block_voxels(
                        sr_labels[..., c0:c0 + cm], s))
                    c0 += cm
                sr_labels = jnp.concatenate(parts, axis=-1)
            seg = self.deep_seg_loss(output[s0:s1], labels,
                                     blocked_labels=blocked_labels)
            rc = jnp.mean(jnp.square(
                output[layout["reconstruction"]].astype(jnp.float32)
                - sr_labels.astype(jnp.float32)))
            student = output[layout["decoder_gram"]].astype(jnp.float32)
            feat = jnp.float32(0.0)
            for t in layout["teacher_grams"]:
                feat = feat + jnp.mean(jnp.square(
                    student - output[t].astype(jnp.float32)))
            feat = feat / self.num_modal
            return (seg + self.rc_loss_weight * rc
                    + self.feature_loss_weight * feat)

        if name == "A2FSeg":
            loss = jnp.float32(0.0)
            for start, end in a2fseg_deep_output_groups(len(output)):
                loss = loss + self.deep_seg_loss(output[start:end], labels)
            primary_w = normalized_deep_loss_weights(
                self.deep_loss_weight, len(self.deep_loss_weight))[0]
            return loss + primary_w * softmax_ce_loss(output[0], labels)

        if name in ("VSmTrans", "UNETRpp", "HDense"):
            return self.deep_seg_loss(output, labels)

        if isinstance(output, (list, tuple)):
            output = output[0]
        return self.seg_loss(output, labels)
