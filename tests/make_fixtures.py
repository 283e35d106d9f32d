"""Synthetic NIfTI dataset fixtures for integration tests.

Generates a tiny AutoPET-style (PET+CT+label) or BraTS-style dataset tree
with ellipsoid "lesions" so pos/neg crop sampling and dice have signal.
"""

from __future__ import annotations

import os

import numpy as np

from veloxseg_tpu.data.nifti import save_nifti


def _blob_volume(rng, shape, n_blobs=2):
    vol = rng.standard_normal(shape).astype(np.float32) * 0.1
    label = np.zeros(shape, dtype=np.int16)
    zz, yy, xx = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    for _ in range(n_blobs):
        c = [rng.integers(s // 4, 3 * s // 4) for s in shape]
        r = rng.integers(3, max(4, min(shape) // 6))
        mask = ((zz - c[0]) ** 2 + (yy - c[1]) ** 2 +
                (xx - c[2]) ** 2) < r ** 2
        vol[mask] += 2.0
        label[mask] = 1
    return vol, label


def make_autopet_fixtures(root: str, n_cases: int = 5,
                          shape=(48, 48, 32), seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "imagesTr")
    lab_dir = os.path.join(root, "labelsTr")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(lab_dir, exist_ok=True)
    for i in range(n_cases):
        pet, label = _blob_volume(rng, shape)
        ct = rng.standard_normal(shape).astype(np.float32) * 0.2 + \
            label * 1.5
        save_nifti(os.path.join(img_dir, f"case{i:03d}_0000.nii.gz"), pet)
        save_nifti(os.path.join(img_dir, f"case{i:03d}_0001.nii.gz"), ct)
        save_nifti(os.path.join(lab_dir, f"case{i:03d}.nii.gz"), label)
    return {
        "ct_path": os.path.join(img_dir, "*0001.nii.gz"),
        "pet_path": os.path.join(img_dir, "*0000.nii.gz"),
        "label_path": os.path.join(lab_dir, "*.nii.gz"),
    }


def make_brats_fixtures(root: str, n_cases: int = 4,
                        shape=(48, 48, 32), seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    for i in range(n_cases):
        case = os.path.join(root, f"BraTS{i:03d}")
        os.makedirs(case, exist_ok=True)
        base, label1 = _blob_volume(rng, shape)
        label = label1.astype(np.int16)
        # multi-class: carve regions 1/2/3 out of the blob
        idx = np.argwhere(label > 0)
        if len(idx):
            third = max(len(idx) // 3, 1)
            for cls, sl in ((2, slice(third, 2 * third)),
                            (3, slice(2 * third, None))):
                sel = idx[sl]
                label[sel[:, 0], sel[:, 1], sel[:, 2]] = cls
        for mod in ("flair", "t1", "t1ce", "t2"):
            img = base + rng.standard_normal(shape).astype(np.float32) * 0.1
            save_nifti(os.path.join(case, f"BraTS{i:03d}_{mod}.nii.gz"),
                       img)
        save_nifti(os.path.join(case, f"BraTS{i:03d}_seg.nii.gz"), label)
    return {
        "flair_path": os.path.join(root, "*", "*_flair.nii.gz"),
        "t1_path": os.path.join(root, "*", "*_t1.nii.gz"),
        "t1ce_path": os.path.join(root, "*", "*_t1ce.nii.gz"),
        "t2_path": os.path.join(root, "*", "*_t2.nii.gz"),
        "label_path": os.path.join(root, "*", "*_seg.nii.gz"),
    }
