"""Unit tests for the fence-verified timing utilities.

These are the primitives every published throughput number now flows
through (``bench.py``, ``cli/speed_main.py``); see PERF_NOTES "Round-3
fencing bug" for why per-iteration ``block_until_ready`` loops are
banned. On the CPU backend the fence is trivially correct — these tests
pin the API contracts (a real device check happens implicitly every time
``bench.py`` runs on the chip via ``assert_in_order``).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import pytest

from veloxseg_tpu.utils import benchmarking


def test_fence_returns_probe_scalar():
    x = jnp.arange(8.0)
    assert benchmarking.fence(x) == 0.0
    assert benchmarking.fence({"a": jnp.full((3,), 7.0)}) == 7.0


def test_fence_is_a_barrier_for_queued_work():
    # after fence(out), the output's value must be final
    f = jax.jit(lambda x: x * 2 + 1)
    out = f(jnp.ones((16, 16)))
    benchmarking.fence(out)
    assert float(out[0, 0]) == 3.0


def test_timed_window_counts_and_bounds():
    f = jax.jit(lambda x: jnp.tanh(x) + 1)
    x = jnp.ones((64, 64))
    holder = [x]

    def dispatch():
        holder[0] = f(holder[0])
        return holder[0]

    n, dt = benchmarking.timed_window(dispatch, seconds=0.2,
                                      probe_iters=3)
    assert n >= 1
    assert dt > 0


def test_timed_window_respects_max_iters():
    f = jax.jit(lambda x: x + 1)
    x = jnp.ones((8,))
    n, dt = benchmarking.timed_window(lambda: f(x), seconds=30.0,
                                      probe_iters=2, max_iters=5)
    assert n <= 5


def test_median_rate_positive_and_scaled():
    f = jax.jit(lambda x: x * 1.5)
    x = jnp.ones((32, 32))
    r1 = benchmarking.median_rate(lambda: f(x), 1.0, windows=3,
                                  seconds=0.05, max_iters=50)
    r16 = benchmarking.median_rate(lambda: f(x), 16.0, windows=3,
                                   seconds=0.05, max_iters=50)
    assert r1 > 0
    # units_per_iter scales the reported rate linearly (same dispatch)
    assert r16 == pytest.approx(16 * r1, rel=0.9)


def test_assert_in_order_cpu_fast():
    t0 = time.perf_counter()
    benchmarking.assert_in_order()
    # trivial on the CPU backend — must not run the heavy device probe
    assert time.perf_counter() - t0 < 5.0
