"""Voxel-wise segmentation metrics (PET/CT-style, binary).

Parity: reference ``utils/metric/metrics.py:42-96`` — FP-rate, FN-rate,
precision, recall, F1, IoU, Dice on integer masks with smooth 1e-5,
averaged over the batch. Inputs are channels-last; predictions are class
indices ``(B, *spatial)`` (or one-hot-argmax'd logits).

These are pure jnp functions — they run on device inside the jitted train
step (one scalar transfer per step instead of whole-tensor syncs).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax.numpy as jnp

_SMOOTH = 1e-5


def segmentation_metrics(gt: jnp.ndarray, pred: jnp.ndarray
                         ) -> Dict[str, jnp.ndarray]:
    """Binary metrics; gt/pred are int masks of equal shape (B, *spatial)."""
    gt = (gt != 0).astype(jnp.float32)
    pred = (pred != 0).astype(jnp.float32)
    axes = tuple(range(1, gt.ndim))

    tp = jnp.sum(gt * pred, axis=axes)
    fp = jnp.sum(pred * (1.0 - gt), axis=axes)
    fn = jnp.sum(gt * (1.0 - pred), axis=axes)
    tn = jnp.sum((1.0 - gt) * (1.0 - pred), axis=axes)
    gt_sum = jnp.sum(gt, axis=axes)
    pred_sum = jnp.sum(pred, axis=axes)
    inter = tp
    union = tp + fp + fn

    precision = tp / (pred_sum + _SMOOTH)
    recall = tp / (gt_sum + _SMOOTH)
    f1 = 2 * precision * recall / (precision + recall + _SMOOTH)
    fp_rate = fp / (fp + tn + _SMOOTH)
    fn_rate = fn / (fn + tp + _SMOOTH)
    iou = inter / (union + _SMOOTH)
    dice = 2 * inter / (gt_sum + pred_sum + _SMOOTH)

    return {
        "fp_rate": jnp.mean(fp_rate),
        "fn_rate": jnp.mean(fn_rate),
        "precision": jnp.mean(precision),
        "recall": jnp.mean(recall),
        "f1": jnp.mean(f1),
        "iou": jnp.mean(iou),
        "dice": jnp.mean(dice),
    }


def pred_from_logits(logits: jnp.ndarray,
                     class_block: int = 1) -> jnp.ndarray:
    """Class prediction from channels-last logits.

    Binary fast path: argmax over a minor axis of 2 compiles to a
    pathological layout on TPU; a compare is one fused pass.
    ``class_block`` > 1: patch-blocked logits (channel = (class, block),
    class slowest) — returns the equally blocked prediction mask.
    """
    blk = class_block
    n = logits.shape[-1] // blk
    if blk > 1:
        if n == 2:
            return (logits[..., blk:]
                    > logits[..., :blk]).astype(jnp.int32)
        sh = logits.shape[:-1]
        return jnp.argmax(logits.reshape(*sh, n, blk), axis=-2)
    if n == 2:
        return (logits[..., 1] > logits[..., 0]).astype(jnp.int32)
    return jnp.argmax(logits, axis=-1)


def deep_metrics(outputs: Sequence[jnp.ndarray], labels: jnp.ndarray
                 ) -> List[Dict[str, jnp.ndarray]]:
    """Per-head metrics for deep-supervision outputs (channels-last logits).

    Mirrors ``show_deep_metrics`` (``utils/metric/metrics.py:6-25``) minus
    the string formatting, which belongs to the logger. Each head's dict
    also carries the ``pix:{output.sum()}/{labels.sum()}`` counts the
    reference prints — note these SUM CLASS INDICES (so for multi-class
    labels they are not voxel counts); reproduced as-is for log parity.
    """
    if not isinstance(outputs, (list, tuple)):
        outputs = [outputs]
    per_head = []
    label_pix = jnp.sum(labels.astype(jnp.int32))
    for o in outputs:
        pred = pred_from_logits(o)
        m = segmentation_metrics(labels, pred)
        m["pred_pix"] = jnp.sum(pred.astype(jnp.int32))
        m["label_pix"] = label_pix
        per_head.append(m)
    return per_head
