"""Data pipeline tests: NIfTI I/O, transforms, loader, HD95."""

import math
import os

import jax.numpy as jnp
import numpy as np
import pytest

from veloxseg_tpu.data.nifti import load_nifti, save_nifti
from veloxseg_tpu.data.transforms import (
    crop_foreground, foreground_bbox, normalize_ct_global,
    normalize_pet_zscore, rand_crop_by_pos_neg_label, rand_rotate_z,
    remap_brats_label, ct_global_statistics)
from veloxseg_tpu.train.hd95 import get_hausdorff, hd95


class TestNifti:
    def test_roundtrip_float(self, tmp_path):
        rng = np.random.default_rng(0)
        vol = rng.standard_normal((10, 12, 14)).astype(np.float32)
        p = os.path.join(tmp_path, "x.nii.gz")
        save_nifti(p, vol, spacing=(1.5, 2.0, 3.0))
        img = load_nifti(p)
        np.testing.assert_allclose(img.data, vol, rtol=1e-6)
        assert img.spacing[:3] == (1.5, 2.0, 3.0)

    def test_roundtrip_int_uncompressed(self, tmp_path):
        vol = np.arange(60, dtype=np.int16).reshape(3, 4, 5)
        p = os.path.join(tmp_path, "y.nii")
        save_nifti(p, vol)
        img = load_nifti(p, dtype=np.int16)
        np.testing.assert_array_equal(img.data, vol)


class TestTransforms:
    def test_foreground_bbox(self):
        v = np.zeros((10, 10, 10), np.float32)
        v[2:5, 3:7, 1:9] = 1.0
        bbox = foreground_bbox(v)
        assert bbox == ((2, 5), (3, 7), (1, 9))
        cropped = crop_foreground([v, v * 2], v)
        assert cropped[0].shape == (3, 4, 8)

    def test_pos_neg_crop_balance(self):
        rng = np.random.default_rng(0)
        label = np.zeros((40, 40, 40), np.int32)
        label[18:22, 18:22, 18:22] = 1
        img = rng.standard_normal((40, 40, 40)).astype(np.float32)
        n_pos = 0
        for _ in range(30):
            samples = rand_crop_by_pos_neg_label(
                [img], label, (16, 16, 16), num_samples=2, rng=rng)
            for s in samples:
                assert s[0].shape == (16, 16, 16)
                assert s[1].shape == (16, 16, 16)
                if s[1].sum() > 0:
                    n_pos += 1
        # pos=1/neg=1 → roughly half the crops contain lesion
        assert 15 < n_pos < 55

    def test_crop_pads_small_volumes(self):
        rng = np.random.default_rng(1)
        label = np.ones((8, 8, 8), np.int32)
        img = rng.standard_normal((8, 8, 8)).astype(np.float32)
        samples = rand_crop_by_pos_neg_label([img], label, (16, 16, 16),
                                             num_samples=1, rng=rng)
        assert samples[0][0].shape == (16, 16, 16)

    def test_rotate_preserves_shape_and_labels(self):
        rng = np.random.default_rng(2)
        img = rng.standard_normal((20, 20, 10)).astype(np.float32)
        label = (rng.random((20, 20, 10)) > 0.8).astype(np.int32)
        vols, lab = rand_rotate_z([img], label, math.radians(15),
                                  prob=1.0, rng=rng)
        assert vols[0].shape == img.shape
        assert lab.shape == label.shape
        assert set(np.unique(lab)) <= {0, 1}  # nearest keeps labels crisp

    def test_native_rotate_matches_scipy(self):
        """Native rotate kernel == scipy.ndimage.rotate at both orders,
        on C- and Fortran-ordered inputs and integer labels."""
        from scipy import ndimage

        from veloxseg_tpu.data.native_ops import _load_rotate, rotate_axes01
        if _load_rotate() is None:
            pytest.skip("native library not built")
        rng = np.random.default_rng(4)
        for shape in ((17, 23, 9), (32, 32, 32)):
            v = rng.standard_normal(shape).astype(np.float32)
            for arr in (v, np.asfortranarray(v)):
                for rad in (-0.63, 0.015, 0.8):
                    for order in (0, 1):
                        got = rotate_axes01(arr, rad, order)
                        want = ndimage.rotate(
                            arr, math.degrees(rad), axes=(0, 1),
                            reshape=False, order=order, mode="nearest")
                        np.testing.assert_allclose(got, want, atol=2e-6)
        lab = (rng.random((32, 32, 32)) > 0.8).astype(np.int32) * 3
        got = rotate_axes01(lab, 0.4, 0)
        want = ndimage.rotate(lab, math.degrees(0.4), axes=(0, 1),
                              reshape=False, order=0, mode="nearest")
        assert got.dtype == lab.dtype
        np.testing.assert_array_equal(got, want)

    def test_normalizations(self):
        rng = np.random.default_rng(3)
        img = rng.standard_normal((10, 10, 10)).astype(np.float32) * 5 + 3
        z = normalize_pet_zscore(img)
        assert abs(z.mean()) < 1e-5 and abs(z.std() - 1) < 1e-4

        stats = ct_global_statistics(img.ravel())
        c = normalize_ct_global(img, stats)
        assert c.max() <= (stats["percentile_99_5"] - stats["mean"]) / \
            stats["std"] + 1e-5

        lab = np.array([0, 1, 2, 4], np.int32)
        np.testing.assert_array_equal(remap_brats_label(lab), [0, 1, 2, 3])


class TestHD95:
    def test_identical_masks_zero(self):
        m = np.zeros((12, 12, 12), bool)
        m[4:8, 4:8, 4:8] = True
        assert hd95(m, m) == 0.0

    def test_empty_mask_nan(self):
        m = np.zeros((8, 8, 8), bool)
        f = np.ones((8, 8, 8), bool)
        assert math.isnan(get_hausdorff(m, f))

    def test_known_offset(self):
        a = np.zeros((20, 20, 20), bool)
        b = np.zeros((20, 20, 20), bool)
        a[5:10, 5:10, 5:10] = True
        b[7:12, 5:10, 5:10] = True  # shifted by 2 along axis 0
        d = hd95(a, b)
        assert 1.0 <= d <= 2.5

    def test_spacing_scales_distance(self):
        a = np.zeros((20, 20, 20), bool)
        b = np.zeros((20, 20, 20), bool)
        a[5:10, 5:10, 5:10] = True
        b[7:12, 5:10, 5:10] = True
        d1 = hd95(a, b, voxelspacing=(1, 1, 1))
        d2 = hd95(a, b, voxelspacing=(2, 1, 1))
        assert d2 > d1


class TestPatchLoader:
    def _loader(self, tmp_path, n_cases, batch_size, drop_last):
        from make_fixtures import make_autopet_fixtures
        from veloxseg_tpu.data.dataset import (PatchLoader,
                                               SegmentationDataset,
                                               default_train_transform)
        patterns = make_autopet_fixtures(str(tmp_path), n_cases=n_cases)
        ds = SegmentationDataset.from_globs(
            {"pet": patterns["pet_path"], "ct": patterns["ct_path"],
             "label": patterns["label_path"]}, "AutoPETII")
        return PatchLoader(
            ds.files, ["pet", "ct"],
            default_train_transform((16, 16, 16), num_samples=2),
            batch_size=batch_size, num_samples=2, num_workers=2,
            shuffle=True, drop_last=drop_last)

    def test_batches_and_tail(self, tmp_path):
        loader = self._loader(tmp_path, n_cases=5, batch_size=2,
                              drop_last=False)
        batches = list(loader)
        # 5 cases x 2 samples = 10 patches; per_batch = 4 -> 2 full + tail 2
        assert len(batches) == len(loader) == 3
        assert [b[0].shape[0] for b in batches] == [4, 4, 2]
        x, y = batches[0]
        assert x.shape == (4, 16, 16, 16, 2) and y.shape == (4, 16, 16, 16)
        assert set(np.unique(y)) <= {0, 1}

    def test_drop_last(self, tmp_path):
        loader = self._loader(tmp_path, n_cases=5, batch_size=2,
                              drop_last=True)
        batches = list(loader)
        # tail (1 case's worth) dropped -> every batch full-size
        assert len(batches) == len(loader) == 2
        assert all(b[0].shape[0] == 4 for b in batches)

    def test_bounded_lookahead_covers_all(self, tmp_path):
        # more cases than the lookahead window: all items still arrive
        loader = self._loader(tmp_path, n_cases=9, batch_size=2,
                              drop_last=False)
        total = sum(b[0].shape[0] for b in loader)
        assert total == 9 * 2


class TestDatasetCache:
    """PatchLoader(cache=True) — decoded-volume cache semantics."""

    def _loader(self, tmp_path, **kw):
        from make_fixtures import make_autopet_fixtures
        from veloxseg_tpu.data.dataset import (PatchLoader,
                                               SegmentationDataset,
                                               default_train_transform)
        patterns = make_autopet_fixtures(str(tmp_path), n_cases=4)
        ds = SegmentationDataset.from_globs(
            {"pet": patterns["pet_path"], "ct": patterns["ct_path"],
             "label": patterns["label_path"]}, "AutoPETII")
        return PatchLoader(
            ds.files, ["pet", "ct"],
            default_train_transform((16, 16, 16), num_samples=2),
            batch_size=2, num_samples=2, num_workers=2, shuffle=False,
            **kw)

    def test_cached_epoch_matches_uncached(self, tmp_path):
        """Same seed → identical batches whether items come from the
        cache (epoch 2) or from disk (cache off)."""
        cached = self._loader(tmp_path, cache=True, seed=7)
        plain = self._loader(tmp_path, cache=False, seed=7)
        e1c = list(cached)          # fills the cache
        assert len(cached._cache) == 4 and cached._cache_bytes > 0
        e2c = list(cached)          # served from cache
        list(plain)
        e2p = list(plain)
        for (xc, yc), (xp, yp) in zip(e2c, e2p):
            np.testing.assert_array_equal(xc, xp)
            np.testing.assert_array_equal(yc, yp)
        assert len(e1c) == len(e2c)

    def test_budget_bounds_cache(self, tmp_path):
        loader = self._loader(tmp_path, cache=True, cache_max_bytes=1)
        list(loader)
        assert len(loader._cache) == 0  # nothing fits; loader still works

    def test_transform_split_composes(self):
        """PatchTransform.__call__ == random(deterministic(...))."""
        from veloxseg_tpu.data.dataset import default_train_transform
        rng_img = np.random.default_rng(0)
        vols = [rng_img.standard_normal((30, 30, 30)).astype(np.float32)]
        label = (rng_img.random((30, 30, 30)) > 0.95).astype(np.int32)
        tf = default_train_transform((16, 16, 16), num_samples=2)
        a = tf(vols, label, np.random.default_rng(3))
        det = tf.deterministic(vols, label)
        b = tf.random(det, np.random.default_rng(3))
        for (xa, ya), (xb, yb) in zip(a, b):
            np.testing.assert_array_equal(xa, xb)
            np.testing.assert_array_equal(ya, yb)


class TestPrefetchToDevice:
    """data/prefetch.py — device prefetch preserves batch order/content."""

    def _batches(self, n=5):
        rng = np.random.default_rng(0)
        return [(rng.normal(size=(2, 4, 4, 4, 2)).astype(np.float32),
                 rng.integers(0, 2, size=(2, 4, 4, 4)).astype(np.int32))
                for _ in range(n)]

    @pytest.mark.parametrize("size", [0, 1, 2, 7])
    def test_order_and_content(self, size):
        from veloxseg_tpu.data.prefetch import prefetch_to_device
        batches = self._batches()
        out = list(prefetch_to_device(iter(batches), size=size))
        assert len(out) == len(batches)
        for (hx, hy), (dx, dy) in zip(batches, out):
            assert isinstance(dx, jnp.ndarray) and isinstance(dy, jnp.ndarray)
            np.testing.assert_array_equal(np.asarray(dx), hx)
            np.testing.assert_array_equal(np.asarray(dy), hy)

    def test_custom_put(self):
        from veloxseg_tpu.data.prefetch import prefetch_to_device
        batches = self._batches(3)
        out = list(prefetch_to_device(
            iter(batches), size=2,
            put=lambda b: (jnp.asarray(b[0]) * 2, jnp.asarray(b[1]))))
        np.testing.assert_allclose(np.asarray(out[1][0]),
                                   batches[1][0] * 2, rtol=1e-6)

    def test_lazy_consumption(self):
        """Lookahead is bounded: pulling one batch must not drain the
        whole source iterator."""
        from veloxseg_tpu.data.prefetch import prefetch_to_device
        pulled = []

        def source():
            for i, b in enumerate(self._batches(6)):
                pulled.append(i)
                yield b

        it = prefetch_to_device(source(), size=2)
        next(it)
        assert len(pulled) <= 3
