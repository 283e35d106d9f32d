"""Multi-device (SPMD) training step.

One ``jax.jit`` over the mesh with explicit input/output shardings: batch
split over the ``data`` axis, leading spatial axis optionally split over
``spatial``, parameters and optimizer state replicated. XLA/GSPMD inserts
the gradient all-reduce (over ``data``) and conv halo exchanges (over
``spatial``) — the collectives ride ICI; no hand-written communication.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..train.loss import CompositeLoss
from ..train.metrics import (deep_metrics, pred_from_logits,
                             segmentation_metrics)
from ..train.train_state import TrainState, _cast_tree
from .mesh import batch_sharding, label_sharding, replicate_sharding


def make_sharded_train_step(mesh, loss_obj: CompositeLoss,
                            compute_dtype=None, spatial_shard: bool = True,
                            with_metrics: bool = True,
                            deep_metric_heads: bool = False):
    """Jitted SPMD train step with mesh shardings baked in.

    ``step(state, inputs, labels, rng) -> (state, aux)``; inputs must be
    laid out with :func:`batch_sharding` (the step enforces it via
    in_shardings).

    The fused-attention Pallas kernels stay ON under SPMD: every call runs
    inside :func:`veloxseg_tpu.ops.pwa_attention.spmd_scope`, so (re)traces
    wrap the kernels in ``jax.shard_map`` over the mesh's ``data`` axis
    (with the global batch offset threaded into the dropout mask — the
    sharded step is bit-identical to the single-device one).
    """
    from ..ops import pwa_attention

    repl = replicate_sharding(mesh)
    x_shard = batch_sharding(mesh, spatial_shard)
    y_shard = label_sharding(mesh, spatial_shard)

    @functools.partial(
        jax.jit,
        in_shardings=(repl, x_shard, y_shard, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
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

    def step_in_scope(state, inputs, labels, rng):
        with pwa_attention.spmd_scope(mesh):
            return step(state, inputs, labels, rng)

    return step_in_scope


def make_sharded_eval_step(mesh, apply_fn, spatial_shard: bool = True):
    """Jitted SPMD eval forward with mesh shardings baked in.

    ``step(params, inputs) -> (preds, logits)``; the batch shards over
    ``data`` (and optionally leading-spatial over ``spatial``) so an
    8-chip pod validates 8-way instead of crawling at single-chip speed;
    outputs come back replicated for the host-side metric reduction.
    Traced under ``spmd_scope`` so the fused eval attention kernel stays
    on via shard_map (nn/pwa.py:240-256).
    """
    from ..ops import pwa_attention

    repl = replicate_sharding(mesh)
    x_shard = batch_sharding(mesh, spatial_shard)

    @functools.partial(jax.jit, in_shardings=(repl, x_shard),
                       out_shardings=(repl, repl))
    def step(params, inputs):
        logits = apply_fn({"params": params}, inputs, train=False)
        return jnp.argmax(logits, axis=-1), logits

    def step_in_scope(params, inputs):
        with pwa_attention.spmd_scope(mesh):
            return step(params, inputs)

    return step_in_scope
