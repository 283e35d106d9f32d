"""Loss and metric parity tests vs torch/MONAI golden implementations."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from veloxseg_tpu.train.loss import CompositeLoss, dice_loss, softmax_ce_loss
from veloxseg_tpu.train.metrics import segmentation_metrics
from veloxseg_tpu.train.metrics_brats import brats_dice

CFG = {"deep_Loss_weight": [1, 1, 1, 1], "RC_Loss_weight": 0.5,
       "Feature_Loss_weight": 2.0}


def _rand_logits_labels(shape_spatial=(6, 6, 6), n_classes=2, b=2, seed=0):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((b, *shape_spatial, n_classes)).astype(
        np.float32)
    labels = rng.integers(0, n_classes, (b, *shape_spatial)).astype(np.int32)
    return logits, labels


def test_ce_matches_torch():
    logits, labels = _rand_logits_labels()
    got = float(softmax_ce_loss(jnp.asarray(logits), jnp.asarray(labels)))
    lt = torch.from_numpy(np.moveaxis(logits, -1, 1))
    want = torch.nn.functional.cross_entropy(
        lt, torch.from_numpy(labels).long()).item()
    assert got == pytest.approx(want, rel=1e-5)


def test_dice_matches_monai():
    monai = pytest.importorskip("monai")
    logits, labels = _rand_logits_labels(n_classes=3)
    got = float(dice_loss(jnp.asarray(logits), jnp.asarray(labels)))
    loss = monai.losses.DiceLoss(include_background=False, to_onehot_y=True,
                                 softmax=True)
    lt = torch.from_numpy(np.moveaxis(logits, -1, 1))
    want = loss(lt, torch.from_numpy(labels[:, None]).long()).item()
    assert got == pytest.approx(want, rel=1e-4)


def test_composite_loss_veloxseg_layout():
    b, s, c, m = 2, 4, 2, 2
    rng = np.random.default_rng(1)
    preds = [jnp.asarray(rng.standard_normal((b, s, s, s, c)),
                         dtype=jnp.float32) for _ in range(4)]
    recons = jnp.asarray(rng.standard_normal((b, s, s, s, m)),
                         dtype=jnp.float32)
    inputs = jnp.asarray(rng.standard_normal((b, s, s, s, m)),
                         dtype=jnp.float32)
    g_student = jnp.asarray(rng.standard_normal((b, 8, 8)),
                            dtype=jnp.float32)
    g_teachers = [jnp.asarray(rng.standard_normal((b, 8, 8)),
                              dtype=jnp.float32) for _ in range(m)]
    labels = jnp.asarray(rng.integers(0, c, (b, s, s, s)), dtype=jnp.int32)

    outs = preds + [recons, g_student] + g_teachers
    loss_obj = CompositeLoss("VeloxSeg", CFG, num_modal=m)
    total = float(loss_obj(outs, labels, sr_labels=inputs))

    # Manual recomputation.
    seg = sum(0.25 * (float(softmax_ce_loss(p, labels))
                      + float(dice_loss(p, labels))) for p in preds)
    rc = float(jnp.mean(jnp.square(recons - inputs)))
    feat = float(sum(jnp.mean(jnp.square(g_student - g))
                     for g in g_teachers)) / m
    assert total == pytest.approx(seg + 0.5 * rc + 2.0 * feat, rel=1e-5)


def test_composite_loss_default_branch():
    logits, labels = _rand_logits_labels()
    loss_obj = CompositeLoss("UNet", CFG)
    got = float(loss_obj(jnp.asarray(logits), jnp.asarray(labels)))
    want = (float(softmax_ce_loss(jnp.asarray(logits), jnp.asarray(labels)))
            + float(dice_loss(jnp.asarray(logits), jnp.asarray(labels))))
    assert got == pytest.approx(want, rel=1e-6)


def test_segmentation_metrics_against_reference_formulas():
    rng = np.random.default_rng(3)
    gt = rng.integers(0, 2, (2, 5, 5, 5)).astype(np.int32)
    pred = rng.integers(0, 2, (2, 5, 5, 5)).astype(np.int32)
    got = {k: float(v) for k, v in
           segmentation_metrics(jnp.asarray(gt), jnp.asarray(pred)).items()}

    # Reference formulas (utils/metric/metrics.py:42-96).
    sm = 1e-5
    dices, ious, fps, fns = [], [], [], []
    for i in range(2):
        g, p = gt[i], pred[i]
        tp = np.sum(g & p); fp = np.sum(p & ~g.astype(bool))
        fn = np.sum(g & ~p.astype(bool)); tn = np.sum(~(g | p).astype(bool))
        inter = np.sum(g & p); union = np.sum(g | p)
        dices.append(2 * inter / (g.sum() + p.sum() + sm))
        ious.append(inter / (union + sm))
        fps.append(fp / (fp + tn + sm))
        fns.append(fn / (fn + tp + sm))
    assert got["dice"] == pytest.approx(np.mean(dices), rel=1e-5)
    assert got["iou"] == pytest.approx(np.mean(ious), rel=1e-5)
    assert got["fp_rate"] == pytest.approx(np.mean(fps), rel=1e-5)
    assert got["fn_rate"] == pytest.approx(np.mean(fns), rel=1e-5)


def test_brats_dice_regions():
    rng = np.random.default_rng(4)
    gt = rng.integers(0, 4, (2, 6, 6, 6)).astype(np.int32)
    pred = gt.copy()
    res = brats_dice(jnp.asarray(pred), jnp.asarray(gt))
    # Perfect prediction → all region dices ≈ 1.
    for k in ("et", "tc", "wt", "avg"):
        assert float(res[k]) == pytest.approx(1.0, abs=1e-4)

    # Region definitions: ET=(3), TC={1,3}, WT=nonzero
    pred2 = np.where(gt == 3, 1, gt)  # ET wrong, TC preserved, WT preserved
    res2 = brats_dice(jnp.asarray(pred2), jnp.asarray(gt))
    assert float(res2["wt"]) == pytest.approx(1.0, abs=1e-4)
    assert float(res2["tc"]) == pytest.approx(1.0, abs=1e-4)
    assert float(res2["et"]) < 0.1


def test_metric_outputs_strips_veloxseg_tail():
    from veloxseg_tpu.train.loss import CompositeLoss
    cfg = {"deep_Loss_weight": [1, 1, 1, 1], "RC_Loss_weight": 0.5,
           "Feature_Loss_weight": 2.0}
    loss = CompositeLoss("VeloxSeg", cfg, num_modal=2)
    # 4 seg heads + recon + student gram + 2 teacher grams = 8 outputs
    outs = [jnp.zeros((1, 4, 4, 4, 2)) + i for i in range(8)]
    heads = loss.metric_outputs(outs)
    assert len(heads) == 4
    assert float(heads[-1][0, 0, 0, 0, 0]) == 3.0
    # non-VeloxSeg models report on the raw list
    loss2 = CompositeLoss("HDense", cfg, num_modal=1)
    assert len(loss2.metric_outputs(outs[:3])) == 3
    assert len(loss2.metric_outputs(outs[0])) == 1


def test_deep_metrics_per_head():
    from veloxseg_tpu.train.metrics import deep_metrics
    rng = np.random.default_rng(0)
    labels = jnp.asarray((rng.standard_normal((2, 6, 6, 6)) > 0.5)
                         .astype(np.int32))
    perfect = jax.nn.one_hot(labels, 2) * 10.0
    wrong = jax.nn.one_hot(1 - labels, 2) * 10.0
    per_head = deep_metrics([perfect, wrong], labels)
    assert len(per_head) == 2
    assert float(per_head[0]["dice"]) == pytest.approx(1.0, abs=1e-3)
    assert float(per_head[1]["dice"]) == pytest.approx(0.0, abs=1e-3)
    assert int(per_head[0]["pred_pix"]) == int(per_head[0]["label_pix"])


def test_blocked_heads_training_is_exact():
    """VeloxSeg(train_blocked_heads=True) + CompositeLoss(blocked_scale)
    computes the SAME loss and step metrics as the pixel-shuffled path
    with the same parameters (CE/Dice/MSE are voxel-wise sums; the
    blocked layout only reorders voxels)."""
    import numpy as np
    from veloxseg_tpu.core.config import VeloxSegConfig
    from veloxseg_tpu.nn.veloxseg import VeloxSeg
    from veloxseg_tpu.train.loss import CompositeLoss
    from veloxseg_tpu.train.train_state import (_metrics_aux,
                                                _train_step_body,
                                                create_train_state)
    from veloxseg_tpu.train.optim import build_optimizer

    cfg = VeloxSegConfig().replace(
        input_size=(32, 32, 32), base_ch=8, attn_base_ch=8,
        depths=(1, 1, 1, 1), conv_depths=(1, 1, 1, 1),
        min_big_window_sizes=((2, 2, 2), (2, 2, 2), (2, 2, 2), (1, 1, 1)),
        attn_drop=0.0, proj_drop=0.0, conv_drop=0.0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 32, 2)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((2, 32, 32, 32)) > 1.0, jnp.int32)
    key = jax.random.PRNGKey(0)
    tcfg = {"deep_Loss_weight": [1, 1, 1, 1], "RC_Loss_weight": 0.5,
            "Feature_Loss_weight": 2.0}
    tx = build_optimizer("adamw", {"lr": 1e-3, "weight_decay": 0.01})

    results = {}
    for blocked in (False, True):
        model = VeloxSeg(cfg, train_blocked_heads=blocked)
        variables = model.init({"params": jax.random.PRNGKey(7),
                                "dropout": key}, x[:1], train=True)
        loss_obj = CompositeLoss(
            "VeloxSeg", tcfg, num_modal=2,
            blocked_scale=cfg.patch_size if blocked else 0,
            blocked_in_ch=cfg.in_ch if blocked else None)
        state = create_train_state(model, variables["params"], tx)
        step = jax.jit(_train_step_body(loss_obj))
        new_state, aux = step(state, x, y, key)
        results[blocked] = (new_state, aux)

    # same init (same param tree regardless of the flag) => identical step
    (su, au), (sb, ab) = results[False], results[True]
    np.testing.assert_allclose(float(ab["loss"]), float(au["loss"]),
                               rtol=2e-5)
    for k in ("dice", "precision", "recall"):
        if k in au:
            np.testing.assert_allclose(np.asarray(ab[k]),
                                       np.asarray(au[k]),
                                       rtol=1e-4, atol=1e-5)

    # NOT compared: post-AdamW params — conv biases feeding InstanceNorm
    # have exactly-zero gradients in exact arithmetic, so both paths
    # produce only fp32 cancellation noise there and Adam's normalizer
    # amplifies that noise to lr scale. The loss/metric equality above
    # plus the shared-everything-else step is the meaningful contract.
    del su, sb
