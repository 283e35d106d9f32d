"""Fence-proof device timing.

Through this environment's tunneled TPU backend,
``jax.block_until_ready`` can return **before the dispatched program has
executed** (measured: 0.000 s for a 70-TFLOP matmul chain that needs
≥0.36 s of device time at peak — see PERF_NOTES "Round-3 fencing bug").
Any loop that times per-iteration ``block_until_ready`` calls therefore
measures *dispatch* throughput, not device throughput, and can report
physically impossible numbers (the round-1/2 train headlines exceed the
chip's bf16 peak FLOP rate once multiplied by the step's XLA cost
analysis).

The only operation observed to be a true execution barrier is a **value
fetch** (``jax.device_get`` / ``float()``), which cannot complete before
the value exists. These helpers time windows of N dispatches that end
with a scalar fetch of a probe *computed from the last dispatch's
output*; TPU streams execute in order (asserted once per process by
:func:`assert_in_order`), so the fetch bounds every dispatch in the
window. The fetch costs one host round trip (~30 ms here) — amortized
over a multi-second window it is noise.
"""

from __future__ import annotations

import time
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp

# one tiny program reused for all probes: first element, fp32
_probe = jax.jit(lambda a: jax.tree_util.tree_leaves(a)[0].ravel()[:1]
                 .astype(jnp.float32))


def fence(out) -> float:
    """TRUE execution barrier on ``out`` (any array / pytree): dispatches
    a tiny probe that depends on it and fetches the value. Returns the
    probe scalar (also handy as an optimization-barrier use)."""
    return float(_probe(out)[0])


_IN_ORDER_CHECKED = False


def assert_in_order(heavy_ms: float = 300.0) -> None:
    """One-shot sanity check that the device executes dispatches in
    order: a light program dispatched after a heavy one must not have
    its value readable before the heavy one's. In-order execution is
    what lets a window-final fence bound every dispatch in the window.

    TPUs (and the PJRT CPU/GPU clients) execute a device's programs in
    submission order, so this is expected to hold everywhere; the check
    exists to catch an exotic backend that reorders, in which case the
    timing helpers would under-measure.
    """
    global _IN_ORDER_CHECKED
    if _IN_ORDER_CHECKED:
        return
    if jax.devices()[0].platform == "cpu":
        # the PJRT CPU client runs a single in-order stream; the heavy
        # probe would cost minutes on a 1-core host for no information
        _IN_ORDER_CHECKED = True
        return
    n = 4096
    a = jnp.ones((n, n), jnp.bfloat16)

    @jax.jit
    def heavy(a):
        def body(i, x):
            return jnp.tanh(x @ a * 0.01)
        return jax.lax.fori_loop(0, 40, body, a)

    light = jax.jit(lambda a: a.ravel()[:1] * 2.0)
    # warm both programs (compile outside the measurement)
    fence(heavy(a))
    fence(light(a))
    t0 = time.perf_counter()
    fence(heavy(a))
    heavy_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    h = heavy(a)
    lv = light(a)
    float(lv[0])
    light_after_heavy = time.perf_counter() - t0
    fence(h)
    # the light fetch must have waited for (most of) the heavy program
    if light_after_heavy < 0.5 * heavy_t:
        raise RuntimeError(
            f"device appears to execute out of order (heavy={heavy_t:.3f}s "
            f"but a subsequent light fetch returned in "
            f"{light_after_heavy:.3f}s); window timing would under-measure")
    _IN_ORDER_CHECKED = True


def timed_window(dispatch: Callable[[], object], *, seconds: float = 10.0,
                 probe_iters: int = 20,
                 max_iters: Optional[int] = None) -> tuple:
    """Time ``dispatch()`` with a window-final fence.

    1. probe phase: ``probe_iters`` dispatches + fence → per-iter
       estimate (includes one fetch RTT, so it slightly over-estimates —
       harmless: it only sizes the window).
    2. timed phase: N = seconds / est dispatches, then fence; wall time
       *includes* the queue drain, so the result is a true lower bound
       on device throughput.

    Returns ``(iters, wall_seconds)``.
    """
    assert_in_order()
    out = None
    for _ in range(probe_iters):
        out = dispatch()
    fence(out)  # drain the warmup queue so the estimate starts clean
    t0 = time.perf_counter()
    for _ in range(probe_iters):
        out = dispatch()
    fence(out)
    est = (time.perf_counter() - t0) / probe_iters
    n = max(int(seconds / max(est, 1e-7)), 1)
    if max_iters is not None:
        n = min(n, max_iters)
    t0 = time.perf_counter()
    for _ in range(n):
        out = dispatch()
    fence(out)
    return n, time.perf_counter() - t0


def median_rate(dispatch: Callable[[], object], units_per_iter: float, *,
                windows: int = 3, seconds: float = 10.0,
                max_iters: Optional[int] = None) -> float:
    """Median units/second over ``windows`` timed windows."""
    rates: List[float] = []
    for _ in range(windows):
        n, dt = timed_window(dispatch, seconds=seconds,
                             max_iters=max_iters)
        rates.append(units_per_iter * n / dt)
    rates.sort()
    return rates[len(rates) // 2]
