"""Multi-device (SPMD) training step.

One ``jax.jit`` over the mesh with explicit input/output shardings: batch
split over the ``data`` axis, leading spatial axis optionally split over
``spatial``, parameters and optimizer state replicated. XLA/GSPMD inserts
the gradient all-reduce (over ``data``) and conv halo exchanges (over
``spatial``) — the collectives ride ICI; no hand-written communication.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..train.loss import CompositeLoss
from ..train.train_state import _train_step_body
from .mesh import (batch_sharding, label_sharding, replicate_sharding,
                   stacked_batch_sharding, stacked_label_sharding)


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

    body = _train_step_body(loss_obj, compute_dtype, with_metrics,
                            deep_metric_heads)
    step = jax.jit(body, in_shardings=(repl, x_shard, y_shard, repl),
                   out_shardings=(repl, repl), donate_argnums=(0,))

    def step_in_scope(state, inputs, labels, rng):
        with pwa_attention.spmd_scope(mesh):
            return step(state, inputs, labels, rng)

    return step_in_scope


def make_sharded_multi_step(mesh, loss_obj: CompositeLoss,
                            compute_dtype=None, spatial_shard: bool = True,
                            with_metrics: bool = True,
                            deep_metric_heads: bool = False,
                            donate_batches: bool = True):
    """SPMD twin of :func:`~veloxseg_tpu.train.train_state.
    train_multi_step_fn`: K full optimizer steps per dispatch via
    ``lax.scan``, each step's batch sharded over the mesh exactly like
    the one-step path (scan axis replicated, batch over ``data``,
    leading spatial over ``spatial``).

    ``multi(state, inputs, labels, rng) -> (state, auxs)`` with
    ``inputs`` (K, B, D, H, W, C), ``labels`` (K, B, D, H, W); per-step
    dropout keys are ``fold_in(rng, k)`` — numerics identical to K
    sequential sharded steps (tested on the CPU mesh).
    """
    from ..ops import pwa_attention

    repl = replicate_sharding(mesh)
    x_shard = stacked_batch_sharding(mesh, spatial_shard)
    y_shard = stacked_label_sharding(mesh, spatial_shard)
    body = _train_step_body(loss_obj, compute_dtype, with_metrics,
                            deep_metric_heads)
    donate = (0, 1, 2) if donate_batches else (0,)

    @functools.partial(jax.jit, in_shardings=(repl, x_shard, y_shard, repl),
                       out_shardings=(repl, repl), donate_argnums=donate)
    def multi(state, inputs, labels, rng):
        def scan_body(carry, xs):
            x, y, k = xs
            return body(carry, x, y, jax.random.fold_in(rng, k))

        return jax.lax.scan(
            scan_body, state,
            (inputs, labels, jnp.arange(inputs.shape[0])))

    def multi_in_scope(state, inputs, labels, rng):
        with pwa_attention.spmd_scope(mesh):
            return multi(state, inputs, labels, rng)

    return multi_in_scope


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
