"""End-to-end CLI integration test: train 2 epochs on synthetic NIfTI
data via run_train flags, then run whole-volume inference via run_test
flags and check the metrics CSV.

This is the framework-level smoke test the reference only had as manual
shell scripts (SURVEY §4).
"""

import glob
import json
import os

import numpy as np
import pytest

from tests.make_fixtures import make_autopet_fixtures

pytestmark = pytest.mark.slow  # full-model XLA compiles

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


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    data_root = os.path.join(root, "data")
    globs = make_autopet_fixtures(data_root, n_cases=5)

    train_config = {
        "patch_size": {"AutoPETII": [32, 32, 32]},
        "spacing": {"AutoPETII": [1, 1, 1]},
        "batch_size": 1,
        "deep_Loss_weight": [1, 1, 1, 1],
        "RC_Loss_weight": 0.5,
        "Feature_Loss_weight": 2.0,
        "train_rate": 0.6,
        "val_rate": 0.2,
        "epochs": 2,
        "show_deep_metric": True,
        "save_model_interval": 1,
        "val_interval": 1,
        "optimizer": {"optimizer_type": "adamw",
                      "optimizer_args": {"lr": 1e-3,
                                         "weight_decay": 0.01}},
        "warmup_scheduler": {"enabled": True, "warmup_epochs": 1},
        "train_scheduler": {"scheduler_type": "cosine_annealing",
                            "scheduler_args": {"epochs": 1,
                                               "min_lr": 1e-5}},
        "save_path": os.path.join(root, "save"),
        "log_path": os.path.join(root, "logs"),
        "dataset_path": {"AutoPETII": globs},
    }
    test_config = {
        "result_metric_path": os.path.join(root, "result", "metric"),
        "result_pred_path": os.path.join(root, "result", "prediction"),
        "sliding_window": {"overlap": 0.25},
    }
    paths = {}
    for name, data in (("train.json", train_config),
                       ("models.json", TINY_MODEL),
                       ("test.json", test_config)):
        p = os.path.join(root, name)
        with open(p, "w") as f:
            json.dump(data, f)
        paths[name] = p
    return root, paths


@pytest.mark.full
def test_train_cli_on_mesh(workspace):
    """`run_train --mesh data=2,spatial=2` end-to-end on the virtual CPU
    mesh — the multi-device path from the CLI (VERDICT r1 item 3). Uses
    the dryrun's full-depth slim model (4 levels at 32³)."""
    import json as _json
    import os as _os

    from veloxseg_tpu.parallel.dryrun import micro_config

    root, paths = workspace
    micro = {"VeloxSeg": {
        k: (list(v) if isinstance(v, tuple) else v)
        for k, v in micro_config().to_dict().items()}}
    with open(paths["train.json"]) as f:
        tc = _json.load(f)
    tc["patch_size"] = {"AutoPETII": [32, 32, 32]}
    tc["epochs"] = 1
    tc["deep_Loss_weight"] = [1, 1, 1, 1]
    tc["save_path"] = _os.path.join(root, "save_mesh")
    # K>1 exercises the sharded multi-step dispatch path through the
    # trainer loop (host-side batch grouping, stacked shardings, ragged
    # tail falling back to single sharded steps).
    tc["steps_per_dispatch"] = 2
    # jax.profiler trace hook (SURVEY §5 observability).
    tc["profile_dir"] = _os.path.join(root, "trace_mesh")
    mpaths = {}
    for name, data in (("train_mesh.json", tc), ("models_mesh.json", micro)):
        p = _os.path.join(root, name)
        with open(p, "w") as f:
            _json.dump(data, f)
        mpaths[name] = p

    from veloxseg_tpu.cli.train_main import main as train_main
    result = train_main([
        "--dataset_name", "AutoPETII",
        "--model_name", "VeloxSeg",
        "--train_config", mpaths["train_mesh.json"],
        "--model_config", mpaths["models_mesh.json"],
        "--num_workers", "2",
        "--model_index", "mesh0",
        "--mesh", "data=2,spatial=2",
    ])
    assert "train_best.ckpt" in os.listdir(result["save_path"])
    assert np.isfinite(result["best_train_dice"])
    # the device trace was captured and is TensorBoard-readable on disk
    assert glob.glob(_os.path.join(root, "trace_mesh", "**", "*.pb"),
                     recursive=True) or glob.glob(
        _os.path.join(root, "trace_mesh", "**", "*.json.gz"),
        recursive=True), "no profiler trace written"


def test_train_then_test_cli(workspace):
    root, paths = workspace

    from veloxseg_tpu.cli.train_main import main as train_main
    result = train_main([
        "--dataset_name", "AutoPETII",
        "--model_name", "VeloxSeg",
        "--train_config", paths["train.json"],
        "--model_config", paths["models.json"],
        "--num_workers", "2",
        "--model_index", "t0",
    ])
    save_path = result["save_path"]
    ckpts = sorted(os.listdir(save_path))
    assert "val_best.ckpt" in ckpts, ckpts
    assert "train_best.ckpt" in ckpts
    assert any(c.endswith(".ckpt") and c[0].isdigit() for c in ckpts)

    from veloxseg_tpu.cli.test_main import main as test_main
    df = test_main([
        "--dataset_name", "AutoPETII",
        "--model_name", "VeloxSeg",
        "--train_config", paths["train.json"],
        "--model_config", paths["models.json"],
        "--test_config", paths["test.json"],
        "--checkpoint_dir", save_path,
        "--checkpoint_index", "val_best",
        "--use_hd95", "1",
        "--sw_batch_size", "2",
    ])
    assert len(df) == 1  # 5 cases * 20% test split
    assert "dice" in df.columns and "hd95" in df.columns
    assert 0.0 <= float(df["dice"].iloc[0]) <= 1.0
    csvs = glob.glob(os.path.join(root, "result", "metric", "*.csv"))
    assert csvs, "metrics CSV not written"


@pytest.mark.full
def test_train_async_checkpoint_and_resume(workspace):
    """Async (Orbax) checkpointing from the CLI: directory checkpoints
    with the reference taxonomy, then resume from one (VERDICT r1 item 6).
    Uses a 2-level 16³ model: this test trains twice single-device, so it
    stays on the smallest config that exercises the checkpoint path."""
    import json as _json
    import os as _os

    root, paths = workspace
    micro = {"VeloxSeg": {
        "input_size": [16, 16, 16], "patch_size": 4, "in_ch": [1, 1],
        "n_classes": 2, "base_ch": 4, "attn_base_ch": 4,
        "conv_depths": [1, 1], "kernel_sizes": [3],
        "min_dim_group": [4, 4], "conv_expansion_factor": [2, 2],
        "depths": [1, 1],
        "min_big_window_sizes": [[2, 2, 2], [2, 2, 2]],
        "min_small_window_sizes": [[1, 1, 1], [1, 1, 1]],
        "min_dim_head": [4, 4], "scale_factors": [2, 2],
        "num_heads": [1, 1], "ffn_expansion_ratio": [2, 2],
        "spatial_dim": 3,
    }}
    with open(paths["train.json"]) as f:
        tc = _json.load(f)
    tc["patch_size"] = {"AutoPETII": [16, 16, 16]}
    tc["epochs"] = 1
    tc["deep_Loss_weight"] = [1, 1]
    tc["async_checkpoint"] = True
    tc["save_path"] = _os.path.join(root, "save_async")
    apaths = {}
    for name, data in (("train_async.json", tc),
                       ("models_async.json", micro)):
        p = _os.path.join(root, name)
        with open(p, "w") as f:
            _json.dump(data, f)
        apaths[name] = p

    from veloxseg_tpu.cli.train_main import main as train_main
    result = train_main([
        "--dataset_name", "AutoPETII",
        "--model_name", "VeloxSeg",
        "--train_config", apaths["train_async.json"],
        "--model_config", apaths["models_async.json"],
        "--num_workers", "2",
        "--model_index", "async0",
    ])
    save_path = result["save_path"]
    assert os.path.isdir(os.path.join(save_path, "train_best"))
    assert os.path.isdir(os.path.join(save_path, "0"))

    # Resume from the Orbax directory checkpoint for one more epoch.
    tc["epochs"] = 2
    with open(apaths["train_async.json"], "w") as f:
        _json.dump(tc, f)
    result2 = train_main([
        "--dataset_name", "AutoPETII",
        "--model_name", "VeloxSeg",
        "--train_config", apaths["train_async.json"],
        "--model_config", apaths["models_async.json"],
        "--num_workers", "2",
        "--model_index", "async1",
        "--checkpoint_path", os.path.join(save_path, "0"),
    ])
    assert np.isfinite(result2["best_train_dice"])


@pytest.mark.full
def test_train_then_test_cli_brats(tmp_path_factory):
    """BraTS2021 profile end-to-end: 4-modality single-branch input
    (`in_ch=[4]` → one patch-embed, one teacher decoder), multi-class
    labels kept {0,1,2,3}, ET/TC/WT dice reporting, and the
    `--specific_sample` region-mask export (reference
    `utils/train_brats2021.py`, `utils/inference_brats.py:210-251`)."""
    from tests.make_fixtures import make_brats_fixtures

    root = str(tmp_path_factory.mktemp("e2e_brats"))
    globs = make_brats_fixtures(os.path.join(root, "data"), n_cases=5)

    model = {"VeloxSeg": {
        "input_size": [32, 32, 32], "patch_size": 4, "in_ch": [4],
        "n_classes": 4, "base_ch": 8, "attn_base_ch": 8,
        "conv_depths": [1, 1, 1, 1], "kernel_sizes": [1, 3, 5],
        "min_dim_group": [4, 8, 8, 16],
        "conv_expansion_factor": [3, 3, 2, 2], "depths": [1, 1, 1, 1],
        "min_big_window_sizes": [[2, 2, 2], [2, 2, 2], [2, 2, 2],
                                 [1, 1, 1]],
        "min_small_window_sizes": [[1, 1, 1]] * 4,
        "min_dim_head": [4, 8, 8, 16], "ffn_expansion_ratio": [3, 3, 2, 2],
        "num_heads": [1, 2, 2, 4], "proj_drop": 0.1, "conv_drop": 0.1,
        "spatial_dim": 3,
    }}
    train_config = {
        "patch_size": {"BraTS2021": [32, 32, 32]},
        "spacing": {"BraTS2021": [1, 1, 1]},
        "batch_size": 1,
        "deep_Loss_weight": [1, 1, 1, 1],
        "RC_Loss_weight": 0.5,
        "Feature_Loss_weight": 2.0,
        "train_rate": 0.6,
        "val_rate": 0.2,
        "epochs": 1,
        "save_model_interval": 1,
        "val_interval": 1,
        "optimizer": {"optimizer_type": "adamw",
                      "optimizer_args": {"lr": 1e-3,
                                         "weight_decay": 0.01}},
        "warmup_scheduler": {"enabled": False},
        "train_scheduler": {"scheduler_type": "cosine_annealing",
                            "scheduler_args": {"epochs": 1,
                                               "min_lr": 1e-5}},
        "save_path": os.path.join(root, "save"),
        "log_path": os.path.join(root, "logs"),
        "dataset_path": {"BraTS2021": globs},
    }
    test_config = {
        "result_metric_path": os.path.join(root, "result", "metric"),
        "result_pred_path": os.path.join(root, "result", "prediction"),
        "sliding_window": {"overlap": 0.25},
    }
    paths = {}
    for name, data in (("train.json", train_config),
                       ("models.json", model),
                       ("test.json", test_config)):
        p = os.path.join(root, name)
        with open(p, "w") as f:
            json.dump(data, f)
        paths[name] = p

    from veloxseg_tpu.cli.train_main import main as train_main
    result = train_main([
        "--dataset_name", "BraTS2021",
        "--model_name", "VeloxSeg",
        "--train_config", paths["train.json"],
        "--model_config", paths["models.json"],
        "--num_workers", "2",
        "--model_index", "b0",
    ])
    save_path = result["save_path"]
    assert "train_best.ckpt" in os.listdir(save_path)
    assert np.isfinite(result["best_train_dice"])

    from veloxseg_tpu.cli.test_main import main as test_main
    common = [
        "--dataset_name", "BraTS2021",
        "--model_name", "VeloxSeg",
        "--train_config", paths["train.json"],
        "--model_config", paths["models.json"],
        "--test_config", paths["test.json"],
        "--checkpoint_dir", save_path,
        "--checkpoint_index", "train_best",
        "--sw_batch_size", "2",
    ]
    df = test_main(common + ["--use_hd95", "1"])
    assert len(df) == 1  # 5 cases * 20% test split
    for col in ("dice_et", "dice_tc", "dice_wt", "dice_avg",
                "hd95_et", "hd95_tc", "hd95_wt"):
        assert col in df.columns, df.columns
    assert 0.0 <= float(df["dice_avg"].iloc[0]) <= 1.0
    csvs = glob.glob(os.path.join(root, "result", "metric", "*.csv"))
    assert csvs, "metrics CSV not written"

    # --specific_sample exports all modalities + prediction + the three
    # region masks instead of metrics (inference_brats.py:221-251).
    df2 = test_main(common + ["--specific_sample", "0"])
    assert len(df2) == 0
    preds = os.listdir(os.path.join(root, "result", "prediction"))
    for suffix in ("_pred", "_et", "_tc", "_wt",
                   "_flair", "_t1", "_t1ce", "_t2"):
        assert any(p.endswith(f"{suffix}.nii.gz") for p in preds), (
            suffix, preds)


@pytest.mark.full
def test_train_then_test_cli_hecktor(tmp_path_factory):
    """Hecktor2022 profile end-to-end: anisotropic patches (the
    reference trains Hecktor at 128×128×64 with [4,4,2]-shaped windows,
    `config/models_config_hecktor2022.json`), no foreground crop
    (`utils/train_hecktor.py:135-136`), ct+pet modality order."""
    root = str(tmp_path_factory.mktemp("e2e_hecktor"))
    globs = make_autopet_fixtures(os.path.join(root, "data"), n_cases=5)

    model = {"VeloxSeg": {
        "input_size": [32, 32, 16], "patch_size": 4, "in_ch": [1, 1],
        "n_classes": 2, "base_ch": 8, "attn_base_ch": 8,
        "conv_depths": [1, 1], "kernel_sizes": [1, 3],
        "min_dim_group": [4, 8], "conv_expansion_factor": [2, 2],
        "depths": [1, 1],
        "min_big_window_sizes": [[4, 4, 2], [2, 2, 1]],
        "min_small_window_sizes": [[1, 1, 1], [1, 1, 1]],
        "min_dim_head": [4, 8], "scale_factors": [2, 2],
        "num_heads": [1, 2], "ffn_expansion_ratio": [2, 2],
        "spatial_dim": 3,
    }}
    train_config = {
        "patch_size": {"Hecktor2022": [32, 32, 16]},
        "spacing": {"Hecktor2022": [1, 1, 1]},
        "batch_size": 1,
        "deep_Loss_weight": [1, 1],
        "RC_Loss_weight": 0.5,
        "Feature_Loss_weight": 2.0,
        "train_rate": 0.6,
        "val_rate": 0.2,
        "epochs": 1,
        "save_model_interval": 1,
        "val_interval": 1,
        "optimizer": {"optimizer_type": "adamw",
                      "optimizer_args": {"lr": 1e-3,
                                         "weight_decay": 0.01}},
        "warmup_scheduler": {"enabled": False},
        "train_scheduler": {"scheduler_type": "cosine_annealing",
                            "scheduler_args": {"epochs": 1,
                                               "min_lr": 1e-5}},
        "save_path": os.path.join(root, "save"),
        "log_path": os.path.join(root, "logs"),
        "dataset_path": {"Hecktor2022": {
            "ct_path": globs["ct_path"], "pet_path": globs["pet_path"],
            "label_path": globs["label_path"]}},
    }
    test_config = {
        "result_metric_path": os.path.join(root, "result", "metric"),
        "result_pred_path": os.path.join(root, "result", "prediction"),
        "sliding_window": {"overlap": 0.25},
    }
    paths = {}
    for name, data in (("train.json", train_config),
                       ("models.json", model),
                       ("test.json", test_config)):
        p = os.path.join(root, name)
        with open(p, "w") as f:
            json.dump(data, f)
        paths[name] = p

    from veloxseg_tpu.cli.train_main import main as train_main
    result = train_main([
        "--dataset_name", "Hecktor2022",
        "--model_name", "VeloxSeg",
        "--train_config", paths["train.json"],
        "--model_config", paths["models.json"],
        "--num_workers", "2",
        "--model_index", "h0",
    ])
    save_path = result["save_path"]
    assert "train_best.ckpt" in os.listdir(save_path)
    assert np.isfinite(result["best_train_dice"])

    from veloxseg_tpu.cli.test_main import main as test_main
    df = test_main([
        "--dataset_name", "Hecktor2022",
        "--model_name", "VeloxSeg",
        "--train_config", paths["train.json"],
        "--model_config", paths["models.json"],
        "--test_config", paths["test.json"],
        "--checkpoint_dir", save_path,
        "--checkpoint_index", "train_best",
        "--sw_batch_size", "2",
    ])
    assert len(df) == 1
    assert 0.0 <= float(df["dice"].iloc[0]) <= 1.0


ZOO_E2E_CONFIGS = {
    # default loss branch (single logits output)
    "MedNeXt": {"num_input_channels": 2, "num_classes": 2},
    # deep-supervised list output → the UNETRpp loss branch
    # (train/loss.py) + per-head metric_outputs inside the real loop
    "UNETRpp": {"in_channels": 2, "out_channels": 2,
                "patch_size": [32, 32, 32], "feature_size": 4,
                "num_heads": 2, "depths": [1, 1, 1, 1],
                "dims": [8, 16, 32, 64], "do_ds": True},
    # grouped deep outputs → the A2FSeg loss branch (num_pool=5 is the
    # reference's fixed depth; the grouped-loss contract hardcodes it)
    "A2FSeg": {"modality_num": 2, "base_num_features": 4,
               "num_classes": 2, "num_pool": 5},
}


@pytest.mark.full
@pytest.mark.parametrize("model_name", sorted(ZOO_E2E_CONFIGS))
def test_train_then_test_cli_zoo(workspace, model_name):
    """Non-VeloxSeg registry models through the SAME CLI drivers the
    reference uses for its zoo (`utils/load_model.py:26-72` +
    `utils/loss.py:68-80`): run_train exercises the model-specific
    CompositeLoss branch and metric_outputs inside the real train loop,
    then run_test sliding-windows the trained checkpoint."""
    import json as _json

    root, paths = workspace
    models = {model_name: ZOO_E2E_CONFIGS[model_name]}
    with open(paths["train.json"]) as f:
        tc = _json.load(f)
    tc["epochs"] = 1
    tc["save_path"] = os.path.join(root, f"save_zoo_{model_name}")
    zpaths = {}
    for name, data in ((f"train_{model_name}.json", tc),
                       (f"models_{model_name}.json", models)):
        p = os.path.join(root, name)
        with open(p, "w") as f:
            _json.dump(data, f)
        zpaths[name] = p

    from veloxseg_tpu.cli.train_main import main as train_main
    result = train_main([
        "--dataset_name", "AutoPETII",
        "--model_name", model_name,
        "--train_config", zpaths[f"train_{model_name}.json"],
        "--model_config", zpaths[f"models_{model_name}.json"],
        "--num_workers", "2",
        "--model_index", f"zoo_{model_name}",
    ])
    save_path = result["save_path"]
    assert "train_best.ckpt" in os.listdir(save_path)
    assert np.isfinite(result["best_train_dice"])

    from veloxseg_tpu.cli.test_main import main as test_main
    df = test_main([
        "--dataset_name", "AutoPETII",
        "--model_name", model_name,
        "--train_config", zpaths[f"train_{model_name}.json"],
        "--model_config", zpaths[f"models_{model_name}.json"],
        "--test_config", paths["test.json"],
        "--checkpoint_dir", save_path,
        "--checkpoint_index", "train_best",
        "--sw_batch_size", "2",
    ])
    assert len(df) == 1
    assert 0.0 <= float(df["dice"].iloc[0]) <= 1.0


def test_speed_cli_device_loop(tmp_path, monkeypatch):
    """`speed_test.py --devices default,cpu` — the reference's
    [cuda, cpu] device loop (`speed_test.py:58-69`). Shrunk protocol
    (tiny input, short windows) so the 1-core box finishes quickly."""
    import json as _json

    from veloxseg_tpu.cli import speed_main

    micro = {"VeloxSeg": {
        "input_size": [16, 16, 16], "patch_size": 4, "in_ch": [1, 1],
        "n_classes": 2, "base_ch": 4, "attn_base_ch": 4,
        "conv_depths": [1, 1], "kernel_sizes": [3],
        "min_dim_group": [4, 4], "conv_expansion_factor": [2, 2],
        "depths": [1, 1],
        "min_big_window_sizes": [[2, 2, 2], [2, 2, 2]],
        "min_small_window_sizes": [[1, 1, 1], [1, 1, 1]],
        "min_dim_head": [4, 4], "scale_factors": [2, 2],
        "num_heads": [1, 1], "ffn_expansion_ratio": [2, 2],
        "spatial_dim": 3,
    }}
    cfg = tmp_path / "models.json"
    cfg.write_text(_json.dumps(micro))
    monkeypatch.setitem(speed_main.INPUT_SIZE, "AutoPETII", (16, 16, 16, 2))
    monkeypatch.setattr(speed_main, "T_TIMED", 0.3)
    monkeypatch.setattr(speed_main, "MAX_BS", 2)

    results = speed_main.main([
        "--dataset", "AutoPETII", "--model_list", "VeloxSeg",
        "--model_config", str(cfg), "--devices", "default,cpu"])
    assert len(results) == 2
    assert [r["device"] for r in results] == ["default", "cpu"]
    assert all(r["throughput"] > 0 for r in results)
