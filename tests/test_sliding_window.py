"""Sliding-window inference tests.

Golden checks: tile grid parity with MONAI's dense patch placement rules,
and blending correctness with an identity predictor.
"""

import numpy as np
import jax.numpy as jnp

from veloxseg_tpu.infer.sliding_window import (
    compute_tile_origins,
    sliding_window_inference,
)


def test_tile_origins_exact_fit():
    assert compute_tile_origins((96,), (96,), 0.25) == [(0,)]


def test_tile_origins_overlap():
    # size 128, roi 96, overlap .25 → interval 72 → starts [0, 32]
    origins = compute_tile_origins((128,), (96,), 0.25)
    assert origins == [(0,), (32,)]


def test_tile_origins_3d_cover():
    origins = compute_tile_origins((200, 96, 150), (96, 96, 96), 0.25)
    for d in range(3):
        starts = sorted({o[d] for o in origins})
        size = (200, 96, 150)[d]
        assert starts[0] == 0
        assert starts[-1] + 96 == size or size <= 96
        # full coverage with overlap
        for a, b in zip(starts, starts[1:]):
            assert b <= a + 96


def test_identity_blending_constant():
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 100, 64, 64, 2)).astype(np.float32))
    out = sliding_window_inference(
        x, (64, 64, 64), sw_batch_size=2, predictor=lambda t: t,
        overlap=0.25, mode="constant")
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_identity_blending_gaussian():
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 100, 64, 64, 2)).astype(np.float32))
    out = sliding_window_inference(
        x, (64, 64, 64), sw_batch_size=2, predictor=lambda t: t,
        overlap=0.25, mode="gaussian")
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-4)


def test_small_volume_padding():
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, 40, 40, 40, 1)).astype(np.float32))
    out = sliding_window_inference(
        x, (64, 64, 64), sw_batch_size=1, predictor=lambda t: t,
        overlap=0.25)
    assert out.shape == (1, 40, 40, 40, 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_cpu_accumulate_matches_device():
    x = jnp.asarray(np.random.default_rng(2).standard_normal(
        (1, 100, 64, 64, 2)).astype(np.float32))
    pred = lambda t: t * 2.0 + 1.0
    dev = sliding_window_inference(x, (64, 64, 64), 2, pred, 0.25)
    host = sliding_window_inference(x, (64, 64, 64), 2, pred, 0.25,
                                    cpu_accumulate=True)
    np.testing.assert_allclose(np.asarray(dev), np.asarray(host), atol=1e-5)


def test_ragged_tail_single_trace():
    # 100/64 @ overlap .25 -> 2 origins on axis 0, 1 elsewhere = 2 tiles;
    # sw_batch_size=3 leaves a ragged tail that must be padded, not
    # retraced: the predictor sees exactly one (padded) batch shape.
    shapes = []

    def predictor(t):
        shapes.append(tuple(t.shape))
        return t * 2.0

    x = jnp.asarray(np.random.default_rng(3).standard_normal(
        (1, 100, 64, 64, 2)).astype(np.float32))
    out = sliding_window_inference(x, (64, 64, 64), 3, predictor, 0.25)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2.0,
                               atol=1e-5)
    assert len(shapes) == 1, f"predictor retraced: {shapes}"
    assert shapes[0][0] == 3


def test_single_program_params_path_matches_legacy():
    # params-arg predictor → whole volume as one jitted program; must
    # agree with the legacy per-batch dispatch path.
    x = jnp.asarray(np.random.default_rng(4).standard_normal(
        (1, 100, 64, 64, 2)).astype(np.float32))
    w = jnp.asarray([[0.5, -1.0], [2.0, 0.25]], jnp.float32)
    legacy = sliding_window_inference(
        x, (64, 64, 64), 2, lambda t: t @ w, 0.25)
    fused = sliding_window_inference(
        x, (64, 64, 64), 2, lambda p, t: t @ p, 0.25, params=w)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(legacy),
                               atol=1e-5)


def test_mesh_sharded_matches_single_device():
    # VERDICT r2 item 5: tile batch sharded over the mesh 'data' axis in
    # the one-program path must reproduce the single-device result.
    import jax
    from veloxseg_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(jax.devices()[:4], data=4, spatial=1)
    x = jnp.asarray(np.random.default_rng(6).standard_normal(
        (1, 100, 64, 64, 2)).astype(np.float32))
    w = jnp.asarray([[0.5, -1.0], [2.0, 0.25]], jnp.float32)
    pred = lambda p, t: t @ p  # noqa: E731 — shared identity for caching
    single = sliding_window_inference(
        x, (64, 64, 64), 2, pred, 0.25, params=w)
    sharded = sliding_window_inference(
        x, (64, 64, 64), 2, pred, 0.25, params=w, mesh=mesh)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               atol=1e-5)


def test_single_program_gaussian_identity():
    x = jnp.asarray(np.random.default_rng(5).standard_normal(
        (1, 100, 64, 64, 2)).astype(np.float32))
    out = sliding_window_inference(
        x, (64, 64, 64), 2, lambda p, t: t * p, 0.25, mode="gaussian",
        params=jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-4)
