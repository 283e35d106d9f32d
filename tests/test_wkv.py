"""WKV recurrence tests: scan vs brute-force reference, gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np

from veloxseg_tpu.ops.wkv import wkv, wkv_scan


def _wkv_bruteforce(w, u, k, v):
    """Direct (unstable but exact for small magnitudes) WKV definition:
    y_t = (Σ_{s<t} e^{(t-1-s)w + k_s} v_s + e^{u+k_t} v_t)
        / (Σ_{s<t} e^{(t-1-s)w + k_s}     + e^{u+k_t})"""
    b, t, c = k.shape
    y = np.zeros((b, t, c), np.float64)
    for bi in range(b):
        for ci in range(c):
            for ti in range(t):
                num = den = 0.0
                for s in range(ti):
                    wgt = np.exp((ti - 1 - s) * w[ci] + k[bi, s, ci])
                    num += wgt * v[bi, s, ci]
                    den += wgt
                bonus = np.exp(u[ci] + k[bi, ti, ci])
                num += bonus * v[bi, ti, ci]
                den += bonus
                y[bi, ti, ci] = num / den
    return y


def test_scan_matches_bruteforce():
    rng = np.random.default_rng(0)
    b, t, c = 2, 7, 3
    w = -np.exp(rng.standard_normal(c).astype(np.float32))  # negative decay
    u = rng.standard_normal(c).astype(np.float32)
    k = rng.standard_normal((b, t, c)).astype(np.float32)
    v = rng.standard_normal((b, t, c)).astype(np.float32)
    got = np.asarray(wkv_scan(jnp.asarray(w), jnp.asarray(u),
                              jnp.asarray(k), jnp.asarray(v)))
    want = _wkv_bruteforce(w, u, k, v)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_wkv_dispatch_and_grad():
    rng = np.random.default_rng(1)
    b, t, c = 2, 5, 4
    w = jnp.asarray(-np.exp(rng.standard_normal(c)), dtype=jnp.float32)
    u = jnp.asarray(rng.standard_normal(c), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, c)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, c)), dtype=jnp.float32)

    y = wkv(w, u, k, v)
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(wkv_scan(w, u, k, v)),
                               rtol=1e-5)

    def loss(w, u, k, v):
        return jnp.sum(jnp.square(wkv(w, u, k, v)))

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(w, u, k, v)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
    # numeric check on one element of dk
    eps = 1e-3
    k2 = k.at[0, 2, 1].add(eps)
    fd = (loss(w, u, k2, v) - loss(w, u, k, v)) / eps
    assert abs(float(fd) - float(grads[2][0, 2, 1])) < 5e-2
