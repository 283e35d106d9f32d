"""Multi-host (multi-process) SPMD: 2 processes x 2 virtual CPU devices.

Real pod slices beyond one host run one JAX process per host; this test
spins up an actual 2-process cluster (jax.distributed + Gloo CPU
collectives), runs one sharded train step of the slim full-depth model
on the 4-device GLOBAL mesh, and checks both processes agree with the
single-process 4-device step on the identical batch — i.e. the
cross-host gradient all-reduce and the make_array_from_callback input
path produce the same training step a single host computes.
"""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = [pytest.mark.slow, pytest.mark.full]  # multi-process clusters

_PORT = "12757"


def _single_process_loss() -> float:
    from veloxseg_tpu.core.config import VeloxSegConfig
    from veloxseg_tpu.nn.veloxseg import VeloxSeg
    from veloxseg_tpu.parallel.mesh import (batch_sharding, label_sharding,
                                            make_mesh, replicate_sharding)
    from veloxseg_tpu.parallel.sharded_step import make_sharded_train_step
    from veloxseg_tpu.train.loss import CompositeLoss
    from veloxseg_tpu.train.optim import build_optimizer
    from veloxseg_tpu.train.train_state import create_train_state

    cfg = VeloxSegConfig(
        input_size=(32, 32, 32), patch_size=4, in_ch=(1, 1), n_classes=2,
        base_ch=8, attn_base_ch=8, depths=(1, 1, 1, 1),
        proj_drop=0.0, attn_drop=0.0, conv_drop=0.0,
        min_big_window_sizes=((2, 2, 2), (2, 2, 2), (2, 2, 2), (1, 1, 1)),
    )
    model = VeloxSeg(cfg)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 32, 32, 32, 2)).astype(np.float32)
    y = rng.integers(0, 2, (2, 32, 32, 32)).astype(np.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)}, jnp.asarray(x), train=True)
    loss_obj = CompositeLoss(
        "VeloxSeg", {"deep_Loss_weight": [1, 1, 1, 1],
                     "RC_Loss_weight": 0.5, "Feature_Loss_weight": 2.0},
        num_modal=2)
    tx = build_optimizer("adamw", {"lr": 2.5e-4, "weight_decay": 0.01})
    state = create_train_state(model, variables["params"], tx)
    mesh = make_mesh(jax.devices()[:4], data=2, spatial=2)
    state = jax.device_put(state, replicate_sharding(mesh))
    xs = jax.device_put(jnp.asarray(x), batch_sharding(mesh))
    ys = jax.device_put(jnp.asarray(y), label_sharding(mesh))
    step = make_sharded_train_step(mesh, loss_obj)
    _, aux = step(state, xs, ys, jax.random.PRNGKey(7))
    return float(aux["loss"])


def test_two_process_step_matches_single_process():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "_dist_worker.py")
    env = {**os.environ, "PYTHONPATH": repo}
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), "2", _PORT],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=repo) for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=1500)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    losses = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
        marks = [ln for ln in out.splitlines() if ln.startswith("DIST_LOSS")]
        assert marks, f"worker {i} printed no loss:\n{out[-3000:]}"
        losses.append(float(marks[0].split()[1]))

    assert losses[0] == pytest.approx(losses[1], abs=1e-6)
    assert losses[0] == pytest.approx(_single_process_loss(), rel=2e-3)


def test_two_process_cli_train_e2e(tmp_path):
    """run_train --distributed end-to-end on a 2-process CPU cluster:
    rank-gated logging/checkpointing, the shared (unsharded) loaders
    feeding global batches through make_array_from_callback, the sharded
    train/val loops, and identical training decisions on every rank."""
    import glob as _glob
    import json

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from make_fixtures import make_autopet_fixtures

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = str(tmp_path)
    globs = make_autopet_fixtures(os.path.join(root, "data"), n_cases=5)
    train_config = {
        "patch_size": {"AutoPETII": [32, 32, 32]},
        "spacing": {"AutoPETII": [1, 1, 1]},
        "batch_size": 1,
        "deep_Loss_weight": [1, 1, 1, 1],
        "RC_Loss_weight": 0.5, "Feature_Loss_weight": 2.0,
        "train_rate": 0.6, "val_rate": 0.2,
        "epochs": 1, "show_deep_metric": False,
        "save_model_interval": 1, "val_interval": 1,
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
    from veloxseg_tpu.parallel.dryrun import micro_config
    model_config = {"VeloxSeg": {
        k: (list(v) if isinstance(v, tuple) else v)
        for k, v in micro_config().to_dict().items()}}
    test_config = {
        "result_metric_path": os.path.join(root, "result", "metric"),
        "result_pred_path": os.path.join(root, "result", "prediction"),
        "sliding_window": {"overlap": 0.25},
    }
    paths = {}
    for key, data in (("train_config", train_config),
                      ("model_config", model_config),
                      ("test_config", test_config)):
        p = os.path.join(root, key + ".json")
        with open(p, "w") as f:
            json.dump(data, f)
        paths[key] = p
    ws_path = os.path.join(root, "ws.json")
    with open(ws_path, "w") as f:
        json.dump(paths, f)

    worker = os.path.join(repo, "tests", "_dist_cli_worker.py")
    env = {**os.environ, "PYTHONPATH": repo}
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), "2", "12758", ws_path],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=repo) for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=2400)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    results = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
        marks = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert marks, f"worker {i} printed no result:\n{out[-4000:]}"
        results.append(json.loads(marks[0][len("RESULT "):]))

    # every rank took identical training decisions...
    assert results[0]["best_train_dice"] == pytest.approx(
        results[1]["best_train_dice"], abs=1e-9)
    assert np.isfinite(results[0]["best_train_dice"])
    # ...and only rank 0 wrote checkpoints (same save_path on this host)
    assert {r["rank"] for r in results} == {0, 1}
    ckpts = _glob.glob(os.path.join(results[0]["save_path"], "*.ckpt"))
    assert any(c.endswith("train_best.ckpt") for c in ckpts), ckpts

    # Leg 2: multi-host inference (run_test --distributed) produced
    # identical per-rank metrics and exactly one CSV (rank 0's).
    tests_res = []
    for out in outs:
        marks = [ln for ln in out.splitlines()
                 if ln.startswith("TEST_RESULT ")]
        assert marks, f"no TEST_RESULT:\n{out[-4000:]}"
        tests_res.append(json.loads(marks[0][len("TEST_RESULT "):]))
    assert tests_res[0]["n"] == tests_res[1]["n"] > 0
    assert tests_res[0]["mean_dice"] == pytest.approx(
        tests_res[1]["mean_dice"], abs=1e-9)
    csvs = _glob.glob(os.path.join(root, "result", "metric", "*.csv"))
    assert len(csvs) == 1, csvs
