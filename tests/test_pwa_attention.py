"""Fused (Pallas) paired-window attention vs the XLA einsum path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from veloxseg_tpu.ops.pwa_attention import (window_attention_pallas,
                                            window_attention_xla)


def _inputs(b=2, h=2, n=5, l=54, c_qk=8, c_v=12, seed=0, dtype=np.float32):
    # Token layout: (B, h, N, C, L) — channels second-minor, L minor.
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, h, n, c_qk, l)).astype(dtype))
    k = jnp.asarray(rng.standard_normal((b, h, n, c_qk, l)).astype(dtype))
    v = jnp.asarray(rng.standard_normal((b, h, n, c_v, l)).astype(dtype))
    bias = jnp.asarray(rng.standard_normal((h, l, l)).astype(np.float32))
    return q, k, v, bias


@pytest.mark.parametrize("l,c_qk,c_v", [(54, 8, 8), (27, 4, 6), (64, 16, 16)])
def test_pallas_matches_xla(l, c_qk, c_v):
    q, k, v, bias = _inputs(l=l, c_qk=c_qk, c_v=c_v)
    scale = 1.0 / np.sqrt(c_qk)
    ref = window_attention_xla(q, k, v, bias, scale)
    fused = window_attention_pallas(q, k, v, bias, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pallas_pads_ragged_n():
    # n not a multiple of the window block — padded windows must not leak.
    q, k, v, bias = _inputs(n=7, l=27, c_qk=4, c_v=4, seed=1)
    ref = window_attention_xla(q, k, v, bias, 0.5)
    fused = window_attention_pallas(q, k, v, bias, 0.5,
                                    block_windows=4, interpret=True)
    assert fused.shape == ref.shape
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pallas_bf16_io():
    q, k, v, bias = _inputs(seed=2)
    scale = 1.0 / np.sqrt(q.shape[-2])
    ref = window_attention_xla(q.astype(jnp.bfloat16),
                               k.astype(jnp.bfloat16),
                               v.astype(jnp.bfloat16), bias, scale)
    fused = window_attention_pallas(q.astype(jnp.bfloat16),
                                    k.astype(jnp.bfloat16),
                                    v.astype(jnp.bfloat16), bias, scale,
                                    interpret=True)
    assert fused.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(fused, np.float32),
                               np.asarray(ref, np.float32),
                               atol=3e-2, rtol=3e-2)


# ---------------------------------------------------------------------------
# Train path: fused attention + in-kernel dropout, custom VJP.
# ---------------------------------------------------------------------------

from veloxseg_tpu.ops.pwa_attention import (_train_xla,  # noqa: E402
                                            window_attention_train)

SEED = jnp.asarray([[1234, 0]], jnp.int32)


def test_train_path_p0_matches_xla_fwd_and_grads():
    q, k, v, bias = _inputs(b=1, h=2, n=3, l=27, c_qk=4, c_v=4, seed=3)
    scale = 0.5

    def fused(q, k, v, bias):
        return jnp.sum(window_attention_train(
            q, k, v, bias, SEED, scale, 0.0, True) ** 2)

    def ref(q, k, v, bias):
        return jnp.sum(window_attention_xla(q, k, v, bias, scale) ** 2)

    np.testing.assert_allclose(float(fused(q, k, v, bias)),
                               float(ref(q, k, v, bias)), rtol=1e-5)
    gf = jax.grad(fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = jax.grad(ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_train_path_dropout_matches_xla_oracle_exactly():
    # Counter-based mask -> the kernel and the XLA fallback are
    # bit-identical when no window padding happens (n % block == 0).
    q, k, v, bias = _inputs(b=2, h=2, n=4, l=27, c_qk=4, c_v=4, seed=4)
    fused = window_attention_train(q, k, v, bias, SEED, 0.5, 0.3, True)
    oracle = _train_xla(q, k, v, bias, SEED, 0.5, 0.3)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(oracle),
                               atol=1e-5, rtol=1e-5)


def test_train_path_dropout_deterministic_given_seed():
    q, k, v, bias = _inputs(b=1, h=1, n=4, l=27, c_qk=4, c_v=4, seed=4)
    o1 = window_attention_train(q, k, v, bias, SEED, 0.5, 0.3, True)
    o2 = window_attention_train(q, k, v, bias, SEED, 0.5, 0.3, True)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    o3 = window_attention_train(q, k, v, bias,
                                jnp.asarray([[999, 0]], jnp.int32),
                                0.5, 0.3, True)
    assert not np.allclose(np.asarray(o1), np.asarray(o3))


def test_train_path_dropout_gradient_finite_difference():
    # The dropout mask depends only on (seed, element id), so the function
    # is smooth in its array inputs - central differences validate the
    # custom VJP (incl. mask handling in the backward kernel).
    q, k, v, bias = _inputs(b=1, h=1, n=2, l=8, c_qk=4, c_v=4, seed=5)
    scale, p = 0.7, 0.25

    def f(q, k, v, bias):
        return jnp.sum(jnp.sin(window_attention_train(
            q, k, v, bias, SEED, scale, p, True)))

    grads = jax.grad(f, argnums=(0, 1, 2, 3))(q, k, v, bias)
    rng = np.random.default_rng(0)
    eps = 1e-3
    for ai, arr in enumerate((q, k, v, bias)):
        flat = np.asarray(arr).ravel()
        for idx in rng.choice(flat.size, size=4, replace=False):
            e = np.zeros_like(flat)
            e[idx] = eps
            pert = e.reshape(arr.shape)
            args_p = [q, k, v, bias]
            args_m = [q, k, v, bias]
            args_p[ai] = arr + pert
            args_m[ai] = arr - pert
            fd = (float(f(*args_p)) - float(f(*args_m))) / (2 * eps)
            an = float(np.asarray(grads[ai]).ravel()[idx])
            np.testing.assert_allclose(an, fd, atol=5e-3, rtol=5e-3)


def test_train_path_dropout_mean_preserving():
    q, k, v, bias = _inputs(b=2, h=1, n=8, l=27, c_qk=4, c_v=4, seed=6)
    p = 0.4
    ones = jnp.ones_like(v)
    out1 = window_attention_train(q, k, ones, jnp.zeros_like(bias),
                                  SEED, 1.0, p, True)
    # With v == 1 each output element is the sum of that row's kept,
    # rescaled softmax weights: mean over many windows must stay ~1.
    assert abs(float(jnp.mean(out1)) - 1.0) < 0.1


# ---------------------------------------------------------------------------
# Row-blocked (flash-style) kernels — the large-L path (bench config's
# L=1024 stage) — and the global-batch-offset property shard_map relies on.
# ---------------------------------------------------------------------------

from veloxseg_tpu.ops.pwa_attention import (_full_train_fits,  # noqa: E402
                                            _rowblock_size)


def test_rowblock_selected_for_large_l():
    assert _full_train_fits(432)          # dataset configs stay full-window
    assert not _full_train_fits(1024)     # bench config stage falls to rb
    assert _rowblock_size(1024) > 0
    assert 1024 % _rowblock_size(1024) == 0


def test_rowblocked_train_matches_xla_oracle_exactly():
    # L=1024 routes to the row-blocked kernels (bn=1 -> no padding ->
    # bit-identical counter-based dropout vs the XLA oracle).
    q, k, v, bias = _inputs(b=1, h=1, n=2, l=1024, c_qk=8, c_v=8, seed=7)
    scale = 1.0 / np.sqrt(8)
    fused = window_attention_train(q, k, v, bias, SEED, scale, 0.3, True)
    oracle = _train_xla(q, k, v, bias, SEED, scale, 0.3)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(oracle),
                               atol=1e-5, rtol=1e-5)


def test_rowblocked_train_grads_match_xla_oracle():
    # The XLA oracle is plain differentiable jnp code with the identical
    # mask -> its autodiff grads are the reference for the custom VJP
    # (dq/dk/dv and the row-slice-accumulated dbias).
    q, k, v, bias = _inputs(b=1, h=2, n=2, l=1024, c_qk=8, c_v=8, seed=8)
    scale = 0.25

    def fused(q, k, v, bias):
        return jnp.sum(jnp.sin(window_attention_train(
            q, k, v, bias, SEED, scale, 0.2, True)))

    def oracle(q, k, v, bias):
        return jnp.sum(jnp.sin(_train_xla(q, k, v, bias, SEED, scale, 0.2)))

    gf = jax.grad(fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = jax.grad(oracle, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)


def test_batch_offset_equals_slice_of_full_batch():
    # The property the SPMD shard_map wrapper relies on: running a batch
    # slice with seed[0,1] = global offset reproduces the full-batch run's
    # slice exactly (kernel path and oracle path).
    q, k, v, bias = _inputs(b=4, h=1, n=2, l=27, c_qk=4, c_v=4, seed=9)
    full = _train_xla(q, k, v, bias, SEED, 0.5, 0.3)
    for lo in (0, 2):
        seed_off = jnp.asarray([[1234, lo]], jnp.int32)
        part_oracle = _train_xla(q[lo:lo + 2], k[lo:lo + 2], v[lo:lo + 2],
                                 bias, seed_off, 0.5, 0.3)
        np.testing.assert_allclose(np.asarray(part_oracle),
                                   np.asarray(full[lo:lo + 2]),
                                   atol=1e-6, rtol=1e-6)
        part_kernel = window_attention_train(
            q[lo:lo + 2], k[lo:lo + 2], v[lo:lo + 2], bias, seed_off,
            0.5, 0.3, True)
        np.testing.assert_allclose(np.asarray(part_kernel),
                                   np.asarray(full[lo:lo + 2]),
                                   atol=1e-5, rtol=1e-5)
