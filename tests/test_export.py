"""Serving export tests: shape-polymorphic StableHLO round trip.

The artifact must (a) reproduce the live model's eval logits exactly,
(b) serve any batch size from one symbolic-batch export, and (c) load
and run without the model code (only the deserialized program + params).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

TINY = {
    "input_size": (16, 16, 16), "patch_size": 4, "in_ch": (1, 1),
    "n_classes": 2, "base_ch": 4, "attn_base_ch": 4,
    "conv_depths": (1, 1), "kernel_sizes": (3,),
    "min_dim_group": (4, 4), "conv_expansion_factor": (2, 2),
    "depths": (1, 1),
    "min_big_window_sizes": ((2, 2, 2), (2, 2, 2)),
    "min_small_window_sizes": ((1, 1, 1), (1, 1, 1)),
    "min_dim_head": (4, 4), "scale_factors": (2, 2),
    "num_heads": (1, 1), "ffn_expansion_ratio": (2, 2),
    "spatial_dim": 3,
}


def _tiny_model():
    from veloxseg_tpu.core.config import VeloxSegConfig
    from veloxseg_tpu.nn.veloxseg import VeloxSeg

    cfg = VeloxSegConfig(**TINY)
    model = VeloxSeg(cfg)
    x = jnp.zeros((1, *cfg.input_size, sum(cfg.in_ch)), jnp.float32)
    # train=True traces the parameter superset (teachers, deep heads) —
    # the same template the CLI builds before loading a checkpoint.
    variables = jax.jit(model.init, static_argnames="train")(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)}, x, train=True)
    return model, cfg, variables["params"]


def test_export_roundtrip_symbolic_batch(tmp_path):
    from veloxseg_tpu.infer.export import (export_eval, load_artifact,
                                           save_artifact)

    model, cfg, params = _tiny_model()
    exported = export_eval(model, params, cfg.input_size,
                           sum(cfg.in_ch))
    path = os.path.join(tmp_path, "tiny.vsx")
    save_artifact(path, exported, params, metadata={"model_name": "tiny"})

    exported2, params2, meta = load_artifact(path)
    assert meta["model_name"] == "tiny"

    rng = np.random.default_rng(0)
    # one symbolic-batch artifact serves bs1 AND bs3
    for bs in (1, 3):
        x = jnp.asarray(rng.standard_normal(
            (bs, *cfg.input_size, sum(cfg.in_ch))), jnp.float32)
        got = exported2.call(params2, x)
        want = model.apply({"params": params}, x, train=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


def test_export_artifact_is_pure_stablehlo():
    """No Mosaic/Pallas custom calls — portable across jaxlib versions
    and platforms (portable_scope contract)."""
    from veloxseg_tpu.infer.export import export_eval

    model, cfg, params = _tiny_model()
    exported = export_eval(model, params, cfg.input_size, sum(cfg.in_ch))
    text = exported.mlir_module()
    assert "tpu_custom_call" not in text
    assert "mosaic" not in text.lower()


def test_export_cli(tmp_path):
    """run_export.py end-to-end: checkpoint dir → artifact file →
    reload and call at a batch size never mentioned at export time."""
    from veloxseg_tpu.cli.export_main import main as export_main
    from veloxseg_tpu.infer.export import load_artifact
    from veloxseg_tpu.train.checkpoint import save_checkpoint

    model, cfg, params = _tiny_model()
    ckpt_dir = os.path.join(tmp_path, "save")
    save_checkpoint(os.path.join(ckpt_dir, "val_best.ckpt"), params)

    model_cfg = {"VeloxSeg": {
        k: (list(v) if isinstance(v, tuple) else v)
        for k, v in TINY.items()}}
    model_cfg["VeloxSeg"]["min_big_window_sizes"] = [
        list(w) for w in TINY["min_big_window_sizes"]]
    model_cfg["VeloxSeg"]["min_small_window_sizes"] = [
        list(w) for w in TINY["min_small_window_sizes"]]
    train_cfg = {
        "patch_size": {"AutoPETII": list(cfg.input_size)},
        "save_path": str(tmp_path),
    }
    paths = {}
    for name, data in (("models.json", model_cfg),
                       ("train.json", train_cfg)):
        p = os.path.join(tmp_path, name)
        with open(p, "w") as f:
            json.dump(data, f)
        paths[name] = p

    out = os.path.join(tmp_path, "veloxseg.vsx")
    export_main([
        "--dataset_name", "AutoPETII",
        "--model_name", "VeloxSeg",
        "--model_config", paths["models.json"],
        "--train_config", paths["train.json"],
        "--checkpoint_dir", ckpt_dir,
        "--checkpoint_index", "val_best",
        "--output", out,
    ])
    assert os.path.exists(out)

    exported, params2, meta = load_artifact(out)
    assert meta["patch_size"] == list(cfg.input_size)
    # random input — a constant volume is degenerate under InstanceNorm
    # (var≈0 amplifies compilation-order noise through rsqrt(var+eps))
    x = jnp.asarray(np.random.default_rng(7).standard_normal(
        (2, *cfg.input_size, sum(cfg.in_ch))), jnp.float32)
    got = exported.call(params2, x)
    want = model.apply({"params": params}, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
