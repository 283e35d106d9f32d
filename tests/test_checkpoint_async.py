"""Async (Orbax) checkpoint round-trip + resume-compat tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from veloxseg_tpu.train.checkpoint import load_checkpoint, load_params
from veloxseg_tpu.train.orbax_ckpt import AsyncCheckpointWriter


def _tree(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "layer1": {"kernel": jnp.asarray(
            rng.standard_normal((3, 4)).astype(np.float32)),
            "bias": jnp.zeros((4,), jnp.float32)},
        "layer2": {"kernel": jnp.asarray(
            rng.standard_normal((4, 2)).astype(np.float32))},
    }


def _assert_trees_equal(a, b):
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(
            np.asarray(x), np.asarray(y)), a, b)


def test_async_save_restore_roundtrip(tmp_path):
    params = _tree()
    tx = optax.adamw(1e-3)
    opt_state = tx.init(params)
    path = str(tmp_path / "5")
    with AsyncCheckpointWriter() as w:
        w.save(path, params, opt_state, epoch=5, best_train_dice=0.71,
               best_val_dice=0.65, scheduler_state={"last_epoch": 5.0})
        w.wait()
        payload = load_checkpoint(path, params_template=params,
                                  opt_state_template=opt_state)
    _assert_trees_equal(payload["params"], params)
    assert payload["epoch"] == 5
    assert payload["best_train_dice"] == pytest.approx(0.71)
    assert payload["best_val_dice"] == pytest.approx(0.65)
    assert payload["scheduler_state"]["last_epoch"] == pytest.approx(5.0)
    # opt_state restores into the optax structure
    _assert_trees_equal(payload["opt_state"], opt_state)


def test_async_overwrite_taxonomy_name(tmp_path):
    # train_best / val_best are rewritten repeatedly by the trainer.
    params = _tree(1)
    path = str(tmp_path / "train_best")
    with AsyncCheckpointWriter() as w:
        w.save(path, params, epoch=1)
        w.wait()
        params2 = jax.tree_util.tree_map(lambda x: x + 1.0, params)
        w.save(path, params2, epoch=2)
        w.wait()
    payload = load_checkpoint(path, params_template=params)
    _assert_trees_equal(payload["params"], params2)
    assert payload["epoch"] == 2


def test_load_params_accepts_orbax_dir(tmp_path):
    params = _tree(2)
    path = str(tmp_path / "val_best")
    with AsyncCheckpointWriter() as w:
        w.save(path, params, epoch=0)
        w.wait()
    restored = load_params(path, params_template=params)
    _assert_trees_equal(restored, params)
    leaf = jax.tree_util.tree_leaves(restored)[0]
    assert isinstance(leaf, jax.Array)
