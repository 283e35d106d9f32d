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

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, inputs, labels, rng):
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
        grads = _cast_tree(grads, jnp.float32)
        state = state.apply_gradients(grads=grads)
        aux = {"loss": loss}
        if with_metrics:
            if deep_metric_heads:
                # compute head-0 metrics once; the deep tuple keeps head 0
                # (the reference's show_deep_metrics prints it with pix)
                per_head = deep_metrics(heads, labels)
                aux.update({k: v for k, v in per_head[0].items()
                            if k not in ("pred_pix", "label_pix")})
                aux["deep"] = tuple(per_head)
            else:
                aux.update(segmentation_metrics(
                    labels, pred_from_logits(heads[0])))
        return state, aux

    return step


def eval_step_fn(apply_fn) -> Callable:
    """Jitted eval forward returning class predictions."""

    @jax.jit
    def step(params, inputs):
        logits = apply_fn({"params": params}, inputs, train=False)
        return jnp.argmax(logits, axis=-1), logits

    return step
