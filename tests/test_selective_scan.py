"""Selective-scan (S6) kernel parity tests.

The associative-scan implementation must match a literal numpy recurrence
(the semantics of mamba's CUDA ``selective_scan_fn`` as invoked by HCMA,
``compared_model/HCMA/HCMA.py:347-387``).
"""

import numpy as np
import jax.numpy as jnp

from veloxseg_tpu.ops.selective_scan import selective_scan, selective_scan_ref


def _naive(u, delta, A, B, C, D, delta_bias, softplus=True):
    b, L, d = u.shape
    n = A.shape[1]
    delta = delta + delta_bias[None, None, :]
    if softplus:
        delta = np.log1p(np.exp(delta))
    y = np.zeros_like(u)
    for bi in range(b):
        h = np.zeros((d, n))
        for t in range(L):
            a_t = np.exp(delta[bi, t][:, None] * A)           # (d, n)
            b_t = (delta[bi, t] * u[bi, t])[:, None] * B[bi, t][None, :]
            h = a_t * h + b_t
            y[bi, t] = h @ C[bi, t] + D * u[bi, t]
    return y


def _random_case(rng, b=2, L=17, d=5, n=4):
    u = rng.standard_normal((b, L, d)).astype(np.float32)
    delta = rng.standard_normal((b, L, d)).astype(np.float32) * 0.5
    A = -np.exp(rng.standard_normal((d, n)).astype(np.float32) * 0.3)
    B = rng.standard_normal((b, L, n)).astype(np.float32)
    C = rng.standard_normal((b, L, n)).astype(np.float32)
    D = rng.standard_normal(d).astype(np.float32)
    bias = rng.standard_normal(d).astype(np.float32) * 0.1
    return u, delta, A, B, C, D, bias


def test_selective_scan_matches_naive():
    rng = np.random.default_rng(0)
    args = _random_case(rng)
    expect = _naive(*args)
    got = np.asarray(selective_scan(*[jnp.asarray(a) for a in args]))
    np.testing.assert_allclose(got, expect, rtol=2e-5, atol=2e-5)


def test_associative_matches_sequential():
    rng = np.random.default_rng(1)
    args = [jnp.asarray(a) for a in _random_case(rng, b=3, L=64, d=8, n=16)]
    y1 = np.asarray(selective_scan(*args))
    y2 = np.asarray(selective_scan_ref(*args))
    np.testing.assert_allclose(y1, y2, rtol=2e-5, atol=2e-5)


def test_no_softplus_path():
    rng = np.random.default_rng(2)
    args = _random_case(rng, b=1, L=9, d=3, n=2)
    expect = _naive(*args, softplus=False)
    got = np.asarray(selective_scan(
        *[jnp.asarray(a) for a in args], delta_softplus=False))
    np.testing.assert_allclose(got, expect, rtol=2e-5, atol=2e-5)
