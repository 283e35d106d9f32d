"""Fused (Pallas) paired-window attention vs the XLA einsum path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from veloxseg_tpu.ops.pwa_attention import (window_attention_pallas,
                                            window_attention_xla)


def _inputs(b=2, h=2, n=5, l=54, c_qk=8, c_v=12, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, h, n, l, c_qk)).astype(dtype))
    k = jnp.asarray(rng.standard_normal((b, h, n, l, c_qk)).astype(dtype))
    v = jnp.asarray(rng.standard_normal((b, h, n, l, c_v)).astype(dtype))
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
    scale = 1.0 / np.sqrt(q.shape[-1])
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
