"""Benchmark harness.

Headline metric (reference protocol parity, ``speed_test.py:117-134``):
eval-forward throughput of the flagship VeloxSeg AutoPET config on
96³ PET+CT patches, mixed precision (bf16 compute — the TPU analogue of
the reference's fp16 autocast), batch ≤ 16. Baseline: 599.06 patches/s on
an RTX 3090 (reference README.md:215).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
Extra diagnostic metrics go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_GPU_PATCHES_PER_S = 599.06
WARMUP_S = 3.0
TIMED_S = 12.0


def _cast_tree(tree, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)


def bench_forward(batch: int = 16, size=(96, 96, 96), channels: int = 2,
                  dtype=jnp.bfloat16) -> float:
    from veloxseg_tpu.core.config import VeloxSegConfig
    from veloxseg_tpu.nn.veloxseg import VeloxSeg

    cfg = VeloxSegConfig().replace(depths=(1, 1, 1, 1),
                                   input_size=tuple(size))
    model = VeloxSeg(cfg)

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, *size, channels), jnp.float32)
    variables = model.init(rng, x[:1], train=False)
    params = _cast_tree(variables["params"], dtype)
    x = x.astype(dtype)

    @jax.jit
    def fwd(params, x):
        return model.apply({"params": params}, x, train=False)

    # Warmup (includes compile).
    out = fwd(params, x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < WARMUP_S:
        jax.block_until_ready(fwd(params, x))

    iters = 0
    t0 = time.perf_counter()
    while True:
        jax.block_until_ready(fwd(params, x))
        iters += 1
        elapsed = time.perf_counter() - t0
        if elapsed >= TIMED_S:
            break
    return batch * iters / elapsed


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    throughput = bench_forward()
    print(json.dumps({
        "metric": "veloxseg_autopet_96cube_fwd_patches_per_s",
        "value": round(throughput, 2),
        "unit": "patches/s",
        "vs_baseline": round(throughput / BASELINE_GPU_PATCHES_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
