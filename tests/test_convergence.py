"""Training-convergence evidence on a learnable synthetic task.

The reference's correctness bar is logged Dice improving over epochs on
real data (``/root/reference/utils/train_autopet.py:295-341``). Real
datasets aren't available in CI, so this drives the REAL training stack
(CLI entry → trainer → loader → warmup→cosine handoff → val-best
checkpointing → sliding-window validation) on strongly-separable
synthetic lesions (bright ellipsoids in both modalities,
``make_fixtures._blob_volume``) until validation Dice clears 0.9 — the
plumbing-only e2e tests cannot catch a model/optimizer wiring bug that
merely slows or caps learning; this does.

Resume-mid-run equivalence is covered separately by
``test_cli_e2e.test_train_async_checkpoint_and_resume``.
"""

from __future__ import annotations

import json
import os

import pytest

import numpy as np

from veloxseg_tpu.data.nifti import save_nifti


def _big_blob_fixtures(root, n_cases=5, shape=(48, 48, 32), seed=0):
    """AutoPET-style fixtures with LARGE bright lesions (radius ~40% of
    the short axis). Small blobs cap achievable Dice near 0.85 — the
    boundary shell is ~3/r of the volume — so the convergence bar needs
    lesions whose interiors dominate."""
    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "imagesTr")
    lab_dir = os.path.join(root, "labelsTr")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(lab_dir, exist_ok=True)
    zz, yy, xx = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    for i in range(n_cases):
        vol = rng.standard_normal(shape).astype(np.float32) * 0.1
        label = np.zeros(shape, np.int16)
        for _ in range(2):
            c = [rng.integers(s // 3, 2 * s // 3) for s in shape]
            r = rng.integers(10, 14)
            mask = ((zz - c[0]) ** 2 + (yy - c[1]) ** 2
                    + (xx - c[2]) ** 2) < r ** 2
            vol[mask] += 2.0
            label[mask] = 1
        ct = rng.standard_normal(shape).astype(np.float32) * 0.2 \
            + label * 1.5
        save_nifti(os.path.join(img_dir, f"case{i:03d}_0000.nii.gz"), vol)
        save_nifti(os.path.join(img_dir, f"case{i:03d}_0001.nii.gz"), ct)
        save_nifti(os.path.join(lab_dir, f"case{i:03d}.nii.gz"), label)
    return {
        "ct_path": os.path.join(img_dir, "*0001.nii.gz"),
        "pet_path": os.path.join(img_dir, "*0000.nii.gz"),
        "label_path": os.path.join(lab_dir, "*.nii.gz"),
    }

TINY_MODEL = {
    "VeloxSeg": {
        "input_size": [32, 32, 32], "patch_size": 4, "in_ch": [1, 1],
        "n_classes": 2, "base_ch": 8, "attn_base_ch": 8,
        "conv_depths": [1, 1, 1, 1], "kernel_sizes": [1, 3, 5],
        "min_dim_group": [4, 8, 8, 16],
        "conv_expansion_factor": [3, 3, 2, 2], "depths": [1, 1, 1, 1],
        "min_big_window_sizes": [[2, 2, 2], [2, 2, 2], [2, 2, 2],
                                 [1, 1, 1]],
        "min_small_window_sizes": [[1, 1, 1]] * 4,
        "min_dim_head": [4, 8, 8, 16], "ffn_expansion_ratio": [3, 3, 2, 2],
        "num_heads": [1, 2, 2, 4], "proj_drop": 0.1, "conv_drop": 0.1,
        "spatial_dim": 3,
    }
}


@pytest.mark.slow
@pytest.mark.full
def test_dice_converges_above_0p9(tmp_path):
    root = str(tmp_path)
    globs = _big_blob_fixtures(os.path.join(root, "data"), n_cases=5)

    epochs = 150
    train_config = {
        "patch_size": {"AutoPETII": [32, 32, 32]},
        "spacing": {"AutoPETII": [1, 1, 1]},
        "batch_size": 1,
        "deep_Loss_weight": [1, 1, 1, 1],
        "RC_Loss_weight": 0.5,
        "Feature_Loss_weight": 2.0,
        "train_rate": 0.6,
        "val_rate": 0.2,
        "epochs": epochs,
        "show_deep_metric": False,
        "save_model_interval": 50,
        "val_interval": 1,
        "optimizer": {"optimizer_type": "adamw",
                      "optimizer_args": {"lr": 2e-3,
                                         "weight_decay": 0.01}},
        # warmup→cosine handoff crossed mid-run (epoch 3), per the
        # reference schedule semantics (utils/train_autopet.py:118-125)
        "warmup_scheduler": {"enabled": True, "warmup_epochs": 3},
        "train_scheduler": {"scheduler_type": "cosine_annealing",
                            "scheduler_args": {"epochs": epochs - 3,
                                               "min_lr": 1e-5}},
        "save_path": os.path.join(root, "save"),
        "log_path": os.path.join(root, "logs"),
        "dataset_path": {"AutoPETII": globs},
    }
    paths = {}
    for name, data in (("train.json", train_config),
                       ("models.json", TINY_MODEL)):
        p = os.path.join(root, name)
        with open(p, "w") as f:
            json.dump(data, f)
        paths[name] = p

    from veloxseg_tpu.cli.train_main import main as train_main
    result = train_main([
        "--dataset_name", "AutoPETII",
        "--model_name", "VeloxSeg",
        "--train_config", paths["train.json"],
        "--model_config", paths["models.json"],
        "--num_workers", "2",
        "--model_index", "conv",
    ])

    best = float(result.get("best_val_dice", 0.0))
    assert best > 0.9, (
        f"val Dice plateaued at {best:.3f} after {epochs} epochs on a "
        f"separable synthetic task — training dynamics are broken")

    # the val-best checkpoint must exist and score what the log claims
    assert "val_best.ckpt" in os.listdir(result["save_path"])
