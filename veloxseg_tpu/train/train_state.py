"""Jitted training step.

One fused XLA program per optimizer step: forward (train-mode multi-output
contract), composite loss, backward, optimizer update and on-device
metrics. Mixed precision casts params+inputs to ``compute_dtype`` (bf16 by
default on TPU) inside the step while the master params and optimizer state
stay fp32; normalization statistics and loss reductions are fp32 throughout
(see nn/norms.py, train/loss.py).

Replaces the reference's eager loop body (``utils/train_autopet.py:225-268``).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax.training import train_state as flax_train_state

from .loss import CompositeLoss
from .metrics import deep_metrics, pred_from_logits, segmentation_metrics


class TrainState(flax_train_state.TrainState):
    """Standard flax TrainState (params / tx / opt_state / step)."""


def create_train_state(model, params, tx) -> TrainState:
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)


def _cast_tree(tree, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if isinstance(x, jnp.ndarray) and jnp.issubdtype(x.dtype,
                                                         jnp.floating)
        else x, tree)


def _loss_grads_fn(
    loss_obj: CompositeLoss,
    compute_dtype: Optional[Any] = None,
    deep_metric_heads: bool = False,
) -> Callable:
    """``f(state, inputs, labels, rng) -> (loss, heads, fp32 grads)`` —
    the forward+backward core shared by every step builder."""

    def f(state: TrainState, inputs, labels, rng):
        def _loss(params):
            p = params
            x = inputs
            if compute_dtype is not None:
                p = _cast_tree(p, compute_dtype)
                x = x.astype(compute_dtype)
            outs = state.apply_fn({"params": p}, x, train=True,
                                  rngs={"dropout": rng})
            loss = loss_obj(outs, labels, sr_labels=x.astype(jnp.float32))
            heads = (loss_obj.metric_outputs(outs) if deep_metric_heads
                     else [outs[0] if isinstance(outs, (list, tuple))
                           else outs])
            return loss, heads

        (loss, heads), grads = jax.value_and_grad(
            _loss, has_aux=True)(state.params)
        return loss, heads, _cast_tree(grads, jnp.float32)

    return f


def _metrics_aux(heads, labels, with_metrics: bool,
                 deep_metric_heads: bool, blocked_scale: int = 0) -> dict:
    """Per-step metric aux dict (device values)."""
    aux = {}
    if with_metrics:
        if blocked_scale > 1:
            # blocked head 0 (VeloxSeg(train_blocked_heads=True)): the
            # binary metrics are voxel-wise sums — compute them on the
            # blocked pred against equally blocked labels (exact)
            from ..ops.pixel_shuffle import block_voxels
            blk_labels = block_voxels(labels, blocked_scale)
            pred = pred_from_logits(heads[0],
                                    class_block=blocked_scale ** 3)
            aux.update(segmentation_metrics(blk_labels, pred))
            if deep_metric_heads:
                # head 0's entry needs the pix counts the trainer log
                # prints (blocked pred sums == unblocked pred sums)
                head0 = dict(aux)
                head0["pred_pix"] = jnp.sum(pred.astype(jnp.int32))
                head0["label_pix"] = jnp.sum(labels.astype(jnp.int32))
                per_head = [head0] + deep_metrics(heads[1:], labels)
                aux["deep"] = tuple(per_head)
        elif deep_metric_heads:
            # compute head-0 metrics once; the deep tuple keeps head 0
            # (the reference's show_deep_metrics prints it with pix)
            per_head = deep_metrics(heads, labels)
            aux.update({k: v for k, v in per_head[0].items()
                        if k not in ("pred_pix", "label_pix")})
            aux["deep"] = tuple(per_head)
        else:
            aux.update(segmentation_metrics(
                labels, pred_from_logits(heads[0])))
    return aux


def _train_step_body(
    loss_obj: CompositeLoss,
    compute_dtype: Optional[Any] = None,
    with_metrics: bool = True,
    deep_metric_heads: bool = False,
) -> Callable:
    """Unjitted step body shared by the single- and multi-step builders."""
    lg = _loss_grads_fn(loss_obj, compute_dtype, deep_metric_heads)

    def step(state: TrainState, inputs, labels, rng):
        loss, heads, grads = lg(state, inputs, labels, rng)
        state = state.apply_gradients(grads=grads)
        aux = {"loss": loss}
        aux.update(_metrics_aux(
            heads, labels, with_metrics, deep_metric_heads,
            blocked_scale=getattr(loss_obj, "blocked_scale", 0)))
        return state, aux

    return step


def train_step_fn(
    loss_obj: CompositeLoss,
    compute_dtype: Optional[Any] = None,
    with_metrics: bool = True,
    deep_metric_heads: bool = False,
) -> Callable:
    """Build the jitted train step.

    Returns ``step(state, inputs, labels, rng) -> (state, aux)`` where
    ``aux`` holds the scalar loss and (optionally) head-0 metrics; with
    ``deep_metric_heads`` it also carries ``aux['deep']`` — a tuple of
    per-seg-head metric dicts (``show_deep_metrics`` parity,
    ``utils/metric/metrics.py:6-25``), computed on device.
    ``inputs``: (B, D, H, W, C) fp32; ``labels``: (B, D, H, W) int32.
    """
    body = _train_step_body(loss_obj, compute_dtype, with_metrics,
                            deep_metric_heads)
    return jax.jit(body, donate_argnums=(0,))


def train_multi_step_fn(
    loss_obj: CompositeLoss,
    compute_dtype: Optional[Any] = None,
    with_metrics: bool = True,
    deep_metric_heads: bool = False,
    donate_batches: bool = True,
) -> Callable:
    """K optimizer steps per dispatch via ``lax.scan``.

    ``multi(state, inputs, labels, rng) -> (state, auxs)`` where
    ``inputs``: (K, B, D, H, W, C), ``labels``: (K, B, D, H, W); each of
    the K slices is one full train step (fwd+bwd+optimizer) with its own
    dropout key (``fold_in(rng, k)``). ``auxs`` is the per-step aux pytree
    stacked on a leading K axis.

    Rationale: on hosts where per-dispatch latency rivals the step's
    device time (this box's tunneled chip has a ~1.8 ms dispatch floor
    that exceeds the 128³ bs16 step compute — PERF_NOTES round 3), one
    dispatch per step leaves the chip idle between steps. Scanning K
    steps amortizes the dispatch to 1/K per step; the loader feeds K
    batches at a time. Numerics are identical to K sequential
    ``train_step_fn`` calls (tested). No reference analogue — torch's
    eager loop pays Python per step by construction.
    """
    body = _train_step_body(loss_obj, compute_dtype, with_metrics,
                            deep_metric_heads)
    donate = (0, 1, 2) if donate_batches else (0,)

    @functools.partial(jax.jit, donate_argnums=donate)
    def multi(state: TrainState, inputs, labels, rng):
        def scan_body(carry, xs):
            x, y, k = xs
            new_state, aux = body(carry, x, y, jax.random.fold_in(rng, k))
            return new_state, aux

        n = inputs.shape[0]
        state, auxs = jax.lax.scan(
            scan_body, state, (inputs, labels, jnp.arange(n)))
        return state, auxs

    return multi


def train_accum_step_fn(
    loss_obj: CompositeLoss,
    compute_dtype: Optional[Any] = None,
    with_metrics: bool = True,
    deep_metric_heads: bool = False,
    donate_batches: bool = True,
) -> Callable:
    """ONE optimizer update from gradients averaged over A micro-batches
    (``lax.scan``): ``step(state, inputs, labels, rng) -> (state, aux)``
    with ``inputs`` (A, b, D, H, W, C), ``labels`` (A, b, D, H, W).

    Equivalent to one :func:`train_step_fn` step on the concatenated
    ``A*b`` batch (exact for the gradients modulo fp reduction order and
    per-micro-batch dropout keys — tested with dropout off) at 1/A the
    activation memory: the backward of micro-batch *i* completes before
    micro-batch *i+1*'s forward begins, so activation liveness never
    exceeds one micro-batch. TPU-native addition for effective batches
    that exceed HBM; no reference analogue.

    ``aux`` matches the single-step aux on the effective batch: scalars
    are micro-batch means, ``*_pix`` counts are sums.
    """
    lg = _loss_grads_fn(loss_obj, compute_dtype, deep_metric_heads)
    donate = (0, 1, 2) if donate_batches else (0,)

    @functools.partial(jax.jit, donate_argnums=donate)
    def step(state: TrainState, inputs, labels, rng):
        a = inputs.shape[0]

        def scan_body(gsum, xs):
            x, y, k = xs
            loss, heads, grads = lg(state, x, y, jax.random.fold_in(rng, k))
            aux = {"loss": loss}
            aux.update(_metrics_aux(
                heads, y, with_metrics, deep_metric_heads,
                blocked_scale=getattr(loss_obj, "blocked_scale", 0)))
            gsum = jax.tree_util.tree_map(jnp.add, gsum, grads)
            return gsum, aux

        zeros = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
        gsum, auxs = jax.lax.scan(
            scan_body, zeros, (inputs, labels, jnp.arange(a)))
        grads = jax.tree_util.tree_map(lambda g: g / a, gsum)
        state = state.apply_gradients(grads=grads)

        def combine(path, v):
            name = path[-1].key if path else ""
            return jnp.sum(v, 0) if name.endswith("_pix") \
                else jnp.mean(v, 0)

        aux = jax.tree_util.tree_map_with_path(combine, auxs)
        return state, aux

    return step


def eval_step_fn(apply_fn) -> Callable:
    """Jitted eval forward returning class predictions."""

    @jax.jit
    def step(params, inputs):
        logits = apply_fn({"params": params}, inputs, train=False)
        return jnp.argmax(logits, axis=-1), logits

    return step
