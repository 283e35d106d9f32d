"""Unit tests for core window math and low-level ops.

Golden values are derived from reference semantics:
- window pyramid / JL channel sizing: ``model/components/PWA.py:56-85``
- align-corners trilinear: ``torch.nn.functional.interpolate``
- pixel shuffle: ``model/components/superpixel.py``
- gram: ``model/components/common_function.py:8-14``
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from veloxseg_tpu.core.windows import compute_window_layout
from veloxseg_tpu.ops.gram import gram_matrix
from veloxseg_tpu.ops.pixel_shuffle import pixel_shuffle_3d
from veloxseg_tpu.ops.resize import interp_matrix, resize_trilinear


class TestWindowLayout:
    def test_autopet_level1(self):
        # 96³ input, patch 4 → 24³ features; min_big 3³ → pairs 3,6,12,24.
        lo = compute_window_layout((24, 24, 24), (3, 3, 3), (1, 1, 1),
                                   2, 1, 4, in_channels=16)
        assert lo.num_pairs == 4
        assert lo.big_windows == ((3,) * 3, (6,) * 3, (12,) * 3, (24,) * 3)
        assert lo.small_windows == ((1,) * 3, (2,) * 3, (4,) * 3, (8,) * 3)
        assert lo.tokens_per_axis == (3, 3, 3)
        assert lo.channels_qk == 4 * 1 * 4 == 16
        assert lo.channels_v == 16
        assert lo.dim_v == 4
        assert lo.windows_per_pair(0) == (8, 8, 8)
        assert lo.windows_per_pair(3) == (1, 1, 1)
        assert lo.num_windows == 512 + 64 + 8 + 1

    def test_autopet_level2(self):
        lo = compute_window_layout((12, 12, 12), (6, 6, 6), (1, 1, 1),
                                   2, 2, 8, in_channels=32)
        assert lo.num_pairs == 2
        assert lo.channels_qk == 2 * 2 * 8 == 32
        assert lo.channels_v == 32
        assert lo.tokens_per_window == 216

    def test_channels_v_rounding(self):
        # channels_v rounds up to a multiple of channels_qk.
        lo = compute_window_layout((12, 12, 12), (6, 6, 6), (1, 1, 1),
                                   2, 2, 8, in_channels=40)
        assert lo.channels_qk == 32
        assert lo.channels_v == 64
        assert lo.dim_v == 16

    def test_hecktor_level1(self):
        lo = compute_window_layout((32, 32, 16), (4, 4, 2), (1, 1, 1),
                                   2, 1, 4, in_channels=16)
        assert lo.num_pairs == 4
        assert lo.tokens_per_axis == (4, 4, 2)

    def test_no_fit_raises(self):
        with pytest.raises(ValueError):
            compute_window_layout((2, 2, 2), (3, 3, 3), (1, 1, 1),
                                  2, 1, 4, 16)


class TestResize:
    def test_interp_matrix_identity(self):
        np.testing.assert_allclose(np.asarray(interp_matrix(8, 8)), np.eye(8))

    @pytest.mark.parametrize("n_in,n_out", [(3, 6), (6, 12), (12, 96),
                                            (3, 96), (24, 96), (5, 7),
                                            (7, 5)])
    def test_matches_torch_align_corners(self, n_in, n_out):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, n_in, n_in, n_in, 3)).astype(np.float32)
        got = np.asarray(resize_trilinear(jnp.asarray(x),
                                          (n_out, n_out, n_out)))
        xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
        want = F.interpolate(xt, size=(n_out, n_out, n_out),
                             mode="trilinear", align_corners=True)
        want = want.permute(0, 2, 3, 4, 1).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_single_axis(self):
        x = jnp.arange(4.0).reshape(1, 4, 1, 1, 1)
        y = resize_trilinear(x, (7, 1, 1))
        np.testing.assert_allclose(
            np.asarray(y).ravel(), [0, 0.5, 1, 1.5, 2, 2.5, 3])


class TestPixelShuffle:
    def test_matches_torch_semantics(self):
        # Channel factors (c, s1, s2, s3), c slowest — same as reference
        # rearrange 'b (c s1 s2 s3) d h w -> b c (d s1) (h s2) (w s3)'.
        rng = np.random.default_rng(1)
        b, d, h, w, c, s = 2, 3, 4, 5, 2, 2
        x_last = rng.standard_normal((b, d, h, w, c * s ** 3)).astype(
            np.float32)
        got = np.asarray(pixel_shuffle_3d(jnp.asarray(x_last), s))

        import einops
        x_first = np.moveaxis(x_last, -1, 1)
        want = einops.rearrange(
            torch.from_numpy(x_first),
            "b (c s1 s2 s3) d h w -> b c (d s1) (h s2) (w s3)",
            s1=s, s2=s, s3=s).numpy()
        np.testing.assert_allclose(got, np.moveaxis(want, 1, -1))

    def test_roundtrip_with_embed(self):
        x = jnp.arange(1 * 2 * 2 * 2 * 8.0).reshape(1, 2, 2, 2, 8)
        y = pixel_shuffle_3d(x, 2)
        assert y.shape == (1, 4, 4, 4, 1)


class TestGram:
    def test_matches_reference_definition(self):
        rng = np.random.default_rng(2)
        x_last = rng.standard_normal((2, 4, 5, 6, 3)).astype(np.float32)
        got = np.asarray(gram_matrix(jnp.asarray(x_last)))
        x_first = np.moveaxis(x_last, -1, 1)  # (b, c, d, h, w)
        want = np.einsum("bmdhw,bndhw->bmn", x_first, x_first) / (
            3 * 4 * 5 * 6)
        np.testing.assert_allclose(got, want, rtol=1e-5)
