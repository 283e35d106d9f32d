"""Single-chip train step + checkpoint round-trip + scheduler tests."""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from veloxseg_tpu.core.config import VeloxSegConfig
from veloxseg_tpu.nn.veloxseg import VeloxSeg
from veloxseg_tpu.train.checkpoint import (load_checkpoint, load_params,
                                           save_checkpoint)
from veloxseg_tpu.train.loss import CompositeLoss
from veloxseg_tpu.train.optim import EpochScheduler, build_optimizer
from veloxseg_tpu.train.train_state import (create_train_state,
                                            train_step_fn)

pytestmark = pytest.mark.slow  # full-model XLA compiles

TRAIN_CFG = {
    "deep_Loss_weight": [1, 1, 1, 1],
    "RC_Loss_weight": 0.5,
    "Feature_Loss_weight": 2.0,
    "epochs": 300,
    "optimizer": {"optimizer_type": "adamw",
                  "optimizer_args": {"lr": 2.5e-4, "weight_decay": 0.01}},
    "warmup_scheduler": {"enabled": True, "warmup_epochs": 10},
    "train_scheduler": {"scheduler_type": "cosine_annealing",
                        "scheduler_args": {"epochs": 290, "min_lr": 6e-6}},
}

TINY = VeloxSegConfig(
    input_size=(32, 32, 32), patch_size=4, in_ch=(1, 1), n_classes=2,
    base_ch=8, attn_base_ch=8, depths=(1, 1, 1, 1),
    min_big_window_sizes=((2, 2, 2), (2, 2, 2), (2, 2, 2), (1, 1, 1)),
)


@pytest.fixture(scope="module")
def state_and_batch():
    """Returns (model, make_state, x, y); the train step donates its input
    state, so each test builds a fresh one."""
    model = VeloxSeg(TINY)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 32, 32, 32, 2)), dtype=jnp.float32)
    y = jnp.asarray(np.random.default_rng(1).integers(0, 2, (2, 32, 32, 32)),
                    dtype=jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)}, x, train=True)

    def make_state():
        tx = build_optimizer("adamw", {"lr": 2.5e-4, "weight_decay": 0.01})
        return create_train_state(
            model, jax.tree_util.tree_map(jnp.copy, variables["params"]), tx)

    return model, make_state, x, y


def test_train_step_decreases_loss(state_and_batch):
    model, make_state, x, y = state_and_batch
    state = make_state()
    loss_obj = CompositeLoss("VeloxSeg", TRAIN_CFG, num_modal=2)
    step = train_step_fn(loss_obj)
    losses = []
    for i in range(5):
        state, aux = step(state, x, y, jax.random.PRNGKey(i))
        losses.append(float(aux["loss"]))
        assert math.isfinite(losses[-1])
        assert 0.0 <= float(aux["dice"]) <= 1.0
    assert losses[-1] < losses[0], losses


def test_multi_step_matches_sequential(state_and_batch):
    """K scanned steps per dispatch == K sequential single steps (same
    per-step dropout keys via fold_in)."""
    from veloxseg_tpu.train.train_state import train_multi_step_fn

    model, make_state, x, y = state_and_batch
    loss_obj = CompositeLoss("VeloxSeg", TRAIN_CFG, num_modal=2)
    rng = jax.random.PRNGKey(42)
    k = 3
    xs = jnp.stack([x * (1.0 + 0.1 * i) for i in range(k)])
    ys = jnp.stack([y] * k)

    step = train_step_fn(loss_obj)
    seq_state = make_state()
    seq_losses = []
    for i in range(k):
        seq_state, aux = step(seq_state, xs[i], ys[i],
                              jax.random.fold_in(rng, i))
        seq_losses.append(float(aux["loss"]))

    multi = train_multi_step_fn(loss_obj)
    init_params = make_state().params  # donated below; snapshot first
    m_state, auxs = multi(make_state(), xs, ys, rng)
    # Chained equivalence: step i's loss depends on all i-1 prior scanned
    # updates, so loss agreement across k steps proves the scan tracks
    # the sequential updates.
    np.testing.assert_allclose(np.asarray(auxs["loss"]),
                               np.asarray(seq_losses), rtol=2e-5)
    assert auxs["dice"].shape == (k,)
    # Params: at cold start AdamW's update is ~lr·sign(g) per element
    # (v is eps-dominated), so elements whose near-zero gradient rounds
    # across 0 differently between the scanned and standalone
    # compilations diverge by up to 2·lr per step — benign fp32 noise
    # the chained-loss check above is insensitive to (those elements
    # have ~zero loss gradient by construction). Assert the two
    # properties that separate that from a real divergence: (a) every
    # element's gap sits inside the k-opposed-lr-steps envelope, and
    # (b) only a small fraction of elements disagree at all.
    lr = 2.5e-4
    gaps = np.concatenate(
        [np.abs(np.asarray(a) - np.asarray(b)).ravel()
         for a, b in zip(jax.tree_util.tree_leaves(m_state.params),
                         jax.tree_util.tree_leaves(seq_state.params))])
    assert gaps.max() <= 2.0 * k * lr * 1.1, gaps.max()
    frac_diverged = float((gaps > 0.2 * lr).mean())
    assert frac_diverged < 0.05, frac_diverged
    del init_params  # retained only to pin the pre-donation buffer


def test_grad_accum_matches_full_batch():
    """train_accum_step_fn: (a) chained equivalence — A duplicated
    micro-batches average to the single-micro gradient, so K accum steps
    track K plain steps; (b) split-batch loss equivalence — the composite
    loss decomposes as a per-sample mean, so accumulating halves reports
    the full-batch loss."""
    from veloxseg_tpu.train.train_state import train_accum_step_fn

    cfg = TINY.replace(proj_drop=0.0, attn_drop=0.0, conv_drop=0.0)
    model = VeloxSeg(cfg)
    x = jnp.asarray(np.random.default_rng(5).standard_normal(
        (2, 32, 32, 32, 2)), dtype=jnp.float32)
    y = jnp.asarray(np.random.default_rng(6).integers(0, 2, (2, 32, 32, 32)),
                    dtype=jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)}, x, train=True)

    def make_state():
        tx = build_optimizer("adamw", {"lr": 2.5e-4, "weight_decay": 0.01})
        return create_train_state(
            model, jax.tree_util.tree_map(jnp.copy, variables["params"]), tx)

    loss_obj = CompositeLoss("VeloxSeg", TRAIN_CFG, num_modal=2)
    rng = jax.random.PRNGKey(9)
    step = train_step_fn(loss_obj)
    accum = train_accum_step_fn(loss_obj, donate_batches=False)

    # (a) duplicated micros: mean of identical grads == the grad.
    xs_dup = jnp.stack([x, x])
    ys_dup = jnp.stack([y, y])
    s_plain, s_accum = make_state(), make_state()
    for i in range(3):
        key = jax.random.fold_in(rng, i)
        s_plain, aux_p = step(s_plain, x, y, key)
        s_accum, aux_a = accum(s_accum, xs_dup, ys_dup, key)
        assert float(aux_a["loss"]) == pytest.approx(float(aux_p["loss"]),
                                                     rel=2e-5)
        assert float(aux_a["dice"]) == pytest.approx(float(aux_p["dice"]),
                                                     abs=1e-6)

    # (b) split halves: reported loss == full-batch loss (per-sample-mean
    # decomposition of CE+Dice+MSE+Gram).
    _, aux_full = step(make_state(), x, y, rng)
    xs_half = x[:, None]   # (2, 1, ...)
    ys_half = y[:, None]
    _, aux_half = accum(make_state(), xs_half, ys_half, rng)
    assert float(aux_half["loss"]) == pytest.approx(
        float(aux_full["loss"]), rel=1e-4)


def test_grouped_batch_iterator():
    """_grouped stacks K same-shape batches and flushes ragged tails as
    singles (no retrace of the multi program on a shape change)."""
    from veloxseg_tpu.train.trainer import _grouped

    mk = lambda b: (jnp.zeros((b, 4, 4, 4, 2)), jnp.zeros((b, 4, 4, 4)))
    batches = [mk(2)] * 5 + [mk(1)]  # ragged final batch
    out = list(_grouped(iter(batches), 2))
    # 2 stacked pairs + 1 leftover same-shape single + 1 ragged single
    assert [o[0].shape for o in out] == [
        (2, 2, 4, 4, 4, 2), (2, 2, 4, 4, 4, 2),
        (2, 4, 4, 4, 2), (1, 4, 4, 4, 2)]


def test_checkpoint_roundtrip(tmp_path, state_and_batch):
    model, make_state, x, y = state_and_batch
    state = make_state()
    path = os.path.join(tmp_path, "ep0.ckpt")
    save_checkpoint(path, state.params, state.opt_state, epoch=3,
                    best_train_dice=0.5, best_val_dice=0.4,
                    scheduler_state={"plateau_scale": 1.0})
    payload = load_checkpoint(path, params_template=state.params,
                              opt_state_template=state.opt_state)
    assert payload["epoch"] == 3
    assert payload["best_train_dice"] == 0.5
    for a, b in zip(jax.tree_util.tree_leaves(payload["params"]),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Bare-params loading path (inference accepts both).
    params = load_params(path, params_template=state.params)
    leaves_a = jax.tree_util.tree_leaves(params)
    assert len(leaves_a) == len(jax.tree_util.tree_leaves(state.params))


def test_scheduler_parity_cosine():
    s = EpochScheduler(TRAIN_CFG)
    base = 2.5e-4
    # warmup epochs 0..9: (e+1)/10 * base
    assert s.learning_rate(0) == pytest.approx(base / 10)
    assert s.learning_rate(9) == pytest.approx(base)
    # cosine from epoch 10: t = e-10, T_max=290, eta_min 6e-6
    for e in (10, 100, 299):
        t = e - 10
        want = 6e-6 + (base - 6e-6) * 0.5 * (
            1 + math.cos(math.pi * t / 290))
        assert s.learning_rate(e) == pytest.approx(want)


def test_scheduler_plateau():
    cfg = dict(TRAIN_CFG)
    cfg["train_scheduler"] = {"scheduler_type": "reducelronplateau",
                              "mode": "max", "patience": 1,
                              "scheduler_args": {"min_lr": 1e-6}}
    s = EpochScheduler(cfg)
    base = 2.5e-4
    assert s.learning_rate(20) == pytest.approx(base)
    s.plateau_step(0.5)
    s.plateau_step(0.4)  # bad 1
    s.plateau_step(0.4)  # bad 2 > patience → drop
    assert s.learning_rate(20) == pytest.approx(base * 0.1)
