"""Numerical parity: reference PyTorch VeloxSeg vs this package's flax model.

Loads the reference ``model/`` package (CPU torch + MONAI stub), random-
initializes it, maps its state dict onto the flax model via
``interop.torch_import``, and asserts forward agreement on fixed inputs —
eval-mode logits and every train-mode output (deep-supervision preds,
reconstructions, Gram matrices). This is the evidence chain for the
"reference-parity Dice" north star: identical weights → identical
functions → identical metrics on identical data.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from veloxseg_tpu.interop import ref_model  # noqa: E402
from veloxseg_tpu.interop.torch_import import convert_state_dict  # noqa: E402

pytestmark = [pytest.mark.slow] + (
    [] if ref_model.reference_available()
    else [pytest.mark.skip(reason="reference source tree unavailable")])


MODEL_CFG = {
    "input_size": [64, 64, 64],
    "patch_size": 4,
    "in_ch": [1, 1],
    "n_classes": 2,
    "base_ch": 8,
    "conv_depths": [1, 1, 1, 1],
    "kernel_sizes": [1, 3, 5],
    "min_dim_group": [4, 8, 8, 16],
    "conv_expansion_factor": [3, 3, 2, 2],
    "attn_base_ch": 8,
    "depths": [1, 1, 1, 1],
    "min_big_window_sizes": [[2, 2, 2], [2, 2, 2], [2, 2, 2], [1, 1, 1]],
    "min_small_window_sizes": [[1, 1, 1], [1, 1, 1], [1, 1, 1], [1, 1, 1]],
    "min_dim_head": [4, 4, 4, 4],
    "scale_factors": [2, 2, 2, 2],
    "num_heads": [1, 1, 1, 1],
    "attn_drop": 0.0,
    "proj_drop": 0.0,
    "drop_path": 0.0,
    "ffn_expansion_ratio": [3, 3, 2, 2],
    "conv_drop": 0.0,
    "deep_supervision": True,
}


@pytest.fixture(scope="module")
def models_and_input():
    from veloxseg_tpu.core.config import VeloxSegConfig
    from veloxseg_tpu.nn.veloxseg import VeloxSeg

    torch.manual_seed(0)
    tmodel = ref_model.build_reference_model(MODEL_CFG)
    tmodel.eval()

    cfg = VeloxSegConfig.from_dict(MODEL_CFG)
    jmodel = VeloxSeg(cfg)
    x = jnp.zeros((1, *cfg.input_size, sum(cfg.in_ch)), jnp.float32)
    template = jax.eval_shape(
        lambda: jmodel.init({"params": jax.random.PRNGKey(0),
                             "dropout": jax.random.PRNGKey(1)}, x,
                            train=True))["params"]
    params = convert_state_dict(tmodel.state_dict(), template)

    rng = np.random.default_rng(42)
    xin = rng.standard_normal((1, 64, 64, 64, 2)).astype(np.float32)
    return tmodel, jmodel, params, cfg, xin


def _torch_fwd(tmodel, xin, train):
    # channels-last (B, D, H, W, C) -> torch channels-first
    xt = torch.from_numpy(np.transpose(xin, (0, 4, 1, 2, 3)))
    tmodel.train(train)
    with torch.no_grad():
        return tmodel(xt)


def _to_last(t: "torch.Tensor") -> np.ndarray:
    a = t.detach().numpy()
    if a.ndim == 5:
        return np.transpose(a, (0, 2, 3, 4, 1))
    return a


def test_state_dict_covers_all_keys(models_and_input):
    tmodel, _, _, _, _ = models_and_input
    # convert_state_dict raises on any unmapped key; success means total
    # coverage of the reference parameter surface.
    tree = convert_state_dict(tmodel.state_dict())
    n_leaves = len(jax.tree_util.tree_leaves(tree))
    n_params = len([k for k, v in tmodel.state_dict().items()
                    if "relative_position_index" not in k])
    assert n_leaves == n_params


def test_eval_logits_parity(models_and_input):
    tmodel, jmodel, params, _, xin = models_and_input
    ref = _to_last(_torch_fwd(tmodel, xin, train=False))
    out = np.asarray(jmodel.apply({"params": params}, jnp.asarray(xin),
                                  train=False))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=2e-4)


def test_train_outputs_parity(models_and_input):
    tmodel, jmodel, params, cfg, xin = models_and_input
    refs = _torch_fwd(tmodel, xin, train=True)
    outs = jmodel.apply({"params": params}, jnp.asarray(xin), train=True,
                        rngs={"dropout": jax.random.PRNGKey(3)})
    # [4 deep preds, recons, student gram, 2 teacher grams]
    assert len(refs) == len(outs) == 4 + 1 + 1 + cfg.num_modalities - 1 + 1
    for i, (r, o) in enumerate(zip(refs, outs)):
        np.testing.assert_allclose(
            np.asarray(o), _to_last(r), rtol=2e-3, atol=5e-4,
            err_msg=f"train output {i} mismatch")


def test_load_params_reads_pth(models_and_input, tmp_path):
    """`load_params` accepts reference .pth files — wrapped, bare, and
    DDP-prefixed (``utils/load_model.py:90-119`` formats)."""
    from veloxseg_tpu.train.checkpoint import load_params

    tmodel, jmodel, params, _, _ = models_and_input
    sd = tmodel.state_dict()
    wrapped = tmp_path / "wrapped.pth"
    bare = tmp_path / "bare.pth"
    ddp = tmp_path / "ddp.pth"
    torch.save({"model": sd, "epoch": 3}, wrapped)
    torch.save(sd, bare)
    torch.save({"module." + k: v for k, v in sd.items()}, ddp)
    for p in (wrapped, bare, ddp):
        loaded = load_params(str(p), params_template=params)
        ref_leaves = jax.tree_util.tree_leaves(params)
        got_leaves = jax.tree_util.tree_leaves(loaded)
        assert len(ref_leaves) == len(got_leaves)
        for a, b in zip(ref_leaves, got_leaves):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_composite_loss_parity_on_identical_outputs(models_and_input):
    """With outputs proven equal, the composite loss on the torch outputs
    equals the loss on the jax outputs — guarding the output-layout slicing
    (``utils/runtime.py:158-174``) end to end."""
    from veloxseg_tpu.train.loss import CompositeLoss

    tmodel, jmodel, params, cfg, xin = models_and_input
    refs = [_to_last(r) for r in _torch_fwd(tmodel, xin, train=True)]
    outs = jmodel.apply({"params": params}, jnp.asarray(xin), train=True,
                        rngs={"dropout": jax.random.PRNGKey(3)})
    rng = np.random.default_rng(7)
    labels = jnp.asarray(rng.integers(0, 2, (1, 64, 64, 64)), jnp.int32)
    loss_obj = CompositeLoss(
        "VeloxSeg",
        {"deep_Loss_weight": [1, 1, 1, 1], "RC_Loss_weight": 0.5,
         "Feature_Loss_weight": 2.0},
        num_modal=cfg.num_modalities)
    sr = jnp.asarray(xin)
    l_ref = float(loss_obj([jnp.asarray(r) for r in refs], labels,
                           sr_labels=sr))
    l_jax = float(loss_obj(list(outs), labels, sr_labels=sr))
    assert l_ref == pytest.approx(l_jax, rel=1e-3)
