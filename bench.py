"""Benchmark harness.

Headline metric = the BASELINE.json north star: VeloxSeg training
throughput (fwd+bwd+optimizer, full composite loss) in 128³ patches/sec
on one chip, compared against the reference's published 599.06 patches/s
(RTX 3090, fp16, *forward-only* at 96³ — the only published throughput;
the north star explicitly asks for ≥3× that figure measured fwd+bwd at
128³, see BASELINE.md).

Prints ONE JSON line; secondary metrics (the reference-protocol
forward-only run) go to stderr. Run with --fwd-only for just the
reference protocol.

Protocol: bf16 compute / fp32 master params, batch 16, jitted+donated
train step, ~3 s warmup + ~10 s timed.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_GPU_PATCHES_PER_S = 599.06
WARMUP_S = 3.0
TIMED_S = 10.0


def _cast_tree(tree, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)


def _flagship(size):
    from veloxseg_tpu.core.config import VeloxSegConfig
    from veloxseg_tpu.nn.veloxseg import VeloxSeg

    cfg = VeloxSegConfig().replace(depths=(1, 1, 1, 1),
                                   input_size=tuple(size))
    if size[0] % 3 != 0:
        # power-of-two window pyramid for sizes 3³ windows can't tile
        cfg = cfg.replace(min_big_window_sizes=(
            (4, 4, 4), (8, 8, 8), (4, 4, 4), (4, 4, 4)))
    return VeloxSeg(cfg), cfg


def bench_forward(batch=16, size=(96, 96, 96), channels=2):
    model, cfg = _flagship(size)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, *size, channels), jnp.float32)
    variables = jax.jit(model.init, static_argnames="train")(
        rng, x[:1], train=False)
    params = _cast_tree(variables["params"], jnp.bfloat16)
    x = x.astype(jnp.bfloat16)

    @jax.jit
    def fwd(params, x):
        return model.apply({"params": params}, x, train=False)

    jax.block_until_ready(fwd(params, x))
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < WARMUP_S:
        jax.block_until_ready(fwd(params, x))
    iters = 0
    t0 = time.perf_counter()
    while True:
        jax.block_until_ready(fwd(params, x))
        iters += 1
        dt = time.perf_counter() - t0
        if dt >= TIMED_S:
            break
    return batch * iters / dt


def bench_train(batch=32, size=(128, 128, 128), channels=2, windows=1,
                steps_per_dispatch=1):
    """Train-step throughput (fwd+bwd+opt, full composite loss).

    ``windows`` > 1 → run that many back-to-back timed windows and return
    the median (the tunneled chip shows real minute-scale throughput
    variance — BENCH_r02 vs the builder's own logs; median-of-N in one
    process is the stable protocol). Batch 32 ≈ the fixed per-step
    dispatch overhead amortized: step time is nearly flat in batch on
    this host (PERF_NOTES round 3), so 32 roughly doubles patches/s over
    16; 48+ fails to compile (HBM).

    ``steps_per_dispatch`` K>1 uses the trainer's multi-step path
    (``train_multi_step_fn``: lax.scan over K full optimizer steps on K
    distinct resident batches per dispatch) — amortizes the host
    dispatch floor exactly as ``steps_per_dispatch`` does in the real
    train loop.
    """
    import numpy as np
    from veloxseg_tpu.train.loss import CompositeLoss
    from veloxseg_tpu.train.optim import build_optimizer
    from veloxseg_tpu.train.train_state import (create_train_state,
                                                train_multi_step_fn,
                                                train_step_fn)

    model, cfg = _flagship(size)
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    k = steps_per_dispatch
    if k > 1:
        x = jnp.asarray(rng.standard_normal((k, batch, *size, channels)),
                        dtype=jnp.float32)
        y = jnp.asarray((rng.standard_normal((k, batch, *size)) > 1.2),
                        dtype=jnp.int32)
        x0 = x[0, :1]
    else:
        x = jnp.asarray(rng.standard_normal((batch, *size, channels)),
                        dtype=jnp.float32)
        y = jnp.asarray((rng.standard_normal((batch, *size)) > 1.2),
                        dtype=jnp.int32)
        x0 = x[:1]
    variables = jax.jit(model.init, static_argnames="train")(
        {"params": key, "dropout": key}, x0, train=True)
    tcfg = {"deep_Loss_weight": [1, 1, 1, 1], "RC_Loss_weight": 0.5,
            "Feature_Loss_weight": 2.0}
    loss_obj = CompositeLoss("VeloxSeg", tcfg, num_modal=channels)
    tx = build_optimizer("adamw", {"lr": 2.5e-4, "weight_decay": 0.01})
    state = create_train_state(model, variables["params"], tx)
    if k > 1:
        # no batch donation: the bench refeeds the same resident batches
        step = train_multi_step_fn(loss_obj, compute_dtype=jnp.bfloat16,
                                   donate_batches=False)
    else:
        step = train_step_fn(loss_obj, compute_dtype=jnp.bfloat16)

    state, aux = step(state, x, y, key)
    jax.block_until_ready(aux["loss"])
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < WARMUP_S:
        state, aux = step(state, x, y, key)
        jax.block_until_ready(aux["loss"])
    results = []
    for _ in range(windows):
        iters = 0
        t0 = time.perf_counter()
        while True:
            state, aux = step(state, x, y, key)
            iters += 1
            if iters % 10 == 0 or k > 1:
                jax.block_until_ready(aux["loss"])
                if time.perf_counter() - t0 >= TIMED_S:
                    break
        jax.block_until_ready(aux["loss"])
        dt = time.perf_counter() - t0
        results.append(k * batch * iters / dt)
    results.sort()
    return results[len(results) // 2]


def bench_sliding_window(size=(192, 192, 192), roi=(96, 96, 96),
                         sw_batch=4, channels=2):
    """Whole-volume sliding-window eval — the north star's second metric
    (volumes/sec, overlap 0.25, constant blending, reference protocol)."""
    from veloxseg_tpu.infer.sliding_window import sliding_window_inference

    model, cfg = _flagship(roi)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, *size, channels), jnp.float32)
    variables = jax.jit(model.init, static_argnames="train")(
        rng, jnp.zeros((1, *roi, channels)), train=False)
    params = _cast_tree(variables["params"], jnp.bfloat16)
    x = x.astype(jnp.bfloat16)

    def predictor(p, tiles):
        return model.apply({"params": p}, tiles, train=False)

    def one_volume():
        out = sliding_window_inference(
            x, roi, sw_batch, predictor, overlap=0.25, mode="constant",
            params=params)
        jax.block_until_ready(out)
        return out

    one_volume()  # compile
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < WARMUP_S:
        one_volume()
    vols = 0
    t0 = time.perf_counter()
    while True:
        one_volume()
        vols += 1
        dt = time.perf_counter() - t0
        if dt >= TIMED_S:
            break
    return vols / dt


def main():
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    if "--fwd-only" in sys.argv:
        throughput = bench_forward()
        print(json.dumps({
            "metric": "veloxseg_96cube_fwd_patches_per_s",
            "value": round(throughput, 2),
            "unit": "patches/s",
            "vs_baseline": round(throughput / BASELINE_GPU_PATCHES_PER_S,
                                 3),
        }))
        return
    # Headline FIRST (median of 3 timed windows) — round 2 ran it last
    # and recorded a number depressed by same-process predecessor benches
    # / chip-state drift (BENCH_r02 7,334 vs the builder's 9,516 log).
    train_batch = 32
    try:
        train = bench_train(batch=train_batch, windows=3)
    except Exception:
        train_batch = 16
        train = bench_train(batch=train_batch, windows=3)
    print(f"single-dispatch: 128^3 train fwd+bwd bs{train_batch} = "
          f"{train:.2f} patches/s (median of 3)", file=sys.stderr)
    # Multi-step dispatch amortization (trainer steps_per_dispatch): the
    # step is dispatch-bound on this host (PERF_NOTES round 3), so K
    # scanned optimizer steps per dispatch raise real train throughput.
    # Falls back through smaller K / batch if the stacked batches exceed
    # HBM. Headline = best protocol; both values are reported.
    multi = 0.0
    multi_cfg = None
    for k, b in ((4, train_batch), (2, train_batch), (4, 16)):
        try:
            multi = bench_train(batch=b, windows=3, steps_per_dispatch=k)
            multi_cfg = (k, b)
            break
        except Exception as e:
            print(f"multi-step k={k} bs{b} failed: {type(e).__name__}",
                  file=sys.stderr)
    if multi_cfg:
        print(f"multi-step: 128^3 train fwd+bwd bs{multi_cfg[1]} x "
              f"{multi_cfg[0]} steps/dispatch = {multi:.2f} patches/s "
              f"(median of 3)", file=sys.stderr)
    single = train
    steps_per_dispatch = 1
    if multi > train:
        train = multi
        train_batch = multi_cfg[1]
        steps_per_dispatch = multi_cfg[0]
    print(f"headline: {train:.2f} patches/s", file=sys.stderr)
    fwd = bench_forward()
    print(f"secondary: 96^3 eval fwd (reference protocol) = "
          f"{fwd:.2f} patches/s = "
          f"{fwd / BASELINE_GPU_PATCHES_PER_S:.1f}x baseline",
          file=sys.stderr)
    sw = bench_sliding_window()
    print(f"secondary: sliding-window whole-volume (192^3, 96^3 ROI, "
          f"overlap .25) = {sw:.2f} volumes/s", file=sys.stderr)
    print(json.dumps({
        "metric": "veloxseg_128cube_train_fwd_bwd_patches_per_s",
        "value": round(train, 2),
        "unit": "patches/s",
        "vs_baseline": round(train / BASELINE_GPU_PATCHES_PER_S, 3),
        "train_batch": train_batch,
        "steps_per_dispatch": steps_per_dispatch,
        "single_dispatch_patches_per_s": round(single, 2),
        "sliding_window_volumes_per_s": round(sw, 3),
        "eval_96cube_fwd_patches_per_s": round(fwd, 2),
    }))


if __name__ == "__main__":
    main()
