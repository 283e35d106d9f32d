"""Shape/contract tests for the VeloxSeg model (channels-last).

Contract reference: ``model/VeloxSeg.py:186-226`` — train mode returns
``[*seg_preds, recons, student_gram, *teacher_grams]``, eval mode returns
seg logits only.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from veloxseg_tpu.core.config import VeloxSegConfig
from veloxseg_tpu.nn.veloxseg import VeloxSeg

pytestmark = pytest.mark.slow  # full-model XLA compiles

TINY = VeloxSegConfig(
    input_size=(32, 32, 32),
    patch_size=4,
    in_ch=(1, 1),
    n_classes=2,
    base_ch=8,
    attn_base_ch=8,
    depths=(1, 1, 1, 1),
    min_big_window_sizes=((2, 2, 2), (2, 2, 2), (2, 2, 2), (1, 1, 1)),
)


@pytest.fixture(scope="module")
def tiny_model_and_params():
    model = VeloxSeg(TINY)
    x = jnp.zeros((1, 32, 32, 32, 2))
    # train=True traces the superset of parameters (teachers, deep heads).
    params = model.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(42)}, x, train=True)
    return model, params


def test_eval_forward_shape(tiny_model_and_params):
    model, params = tiny_model_and_params
    x = jnp.ones((1, 32, 32, 32, 2))
    y = model.apply(params, x, train=False)
    assert y.shape == (1, 32, 32, 32, 2)
    assert np.isfinite(np.asarray(y)).all()


def test_train_forward_contract(tiny_model_and_params):
    model, params = tiny_model_and_params
    x = jnp.ones((1, 32, 32, 32, 2))
    outs = model.apply(params, x, train=True,
                       rngs={"dropout": jax.random.PRNGKey(1)})
    # 4 deep-supervision preds + recons + student gram + 2 teacher grams.
    assert len(outs) == 8
    for p in outs[:4]:
        assert p.shape == (1, 32, 32, 32, 2)
    assert outs[4].shape == (1, 32, 32, 32, 2)    # recons (2 modalities)
    assert outs[5].shape == (1, 8, 8)             # student gram (base_ch)
    assert outs[6].shape == (1, 8, 8)
    assert outs[7].shape == (1, 8, 8)
    for o in outs:
        assert np.isfinite(np.asarray(o)).all()


def test_eval_on_different_divisible_size(tiny_model_and_params):
    """Like the reference, the window pyramid is fixed by the config but
    gathering follows the runtime tensor — any divisible input size must
    work (speed_test/sliding-window feed different shapes)."""
    model, params = tiny_model_and_params
    x = jnp.ones((1, 64, 64, 64, 2))
    y = model.apply(params, x, train=False)
    assert y.shape == (1, 64, 64, 64, 2)


def test_single_modality_brats_style():
    cfg = TINY.replace(in_ch=(4,), n_classes=4)
    model = VeloxSeg(cfg)
    x = jnp.ones((1, 32, 32, 32, 4))
    params = model.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(42)}, x, train=True)
    y = model.apply(params, x, train=False)
    assert y.shape == (1, 32, 32, 32, 4)
    outs = model.apply(params, x, train=True,
                       rngs={"dropout": jax.random.PRNGKey(1)})
    # 4 preds + recons + student gram + 1 teacher gram.
    assert len(outs) == 7
    assert outs[4].shape == (1, 32, 32, 32, 4)


def test_anisotropic_hecktor_style():
    """Hecktor trains at 128×128×64 with [4,4,2]-shaped windows
    (``config/models_config_hecktor2022.json``). Anisotropic input,
    window, and patch-merging paths through the full model."""
    cfg = TINY.replace(
        input_size=(64, 64, 32),
        min_big_window_sizes=((4, 4, 2), (4, 4, 2), (2, 2, 1), (2, 2, 1)),
    )
    model = VeloxSeg(cfg)
    x = jnp.ones((1, 64, 64, 32, 2))
    params = model.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(42)}, x, train=True)
    y = model.apply(params, x, train=False)
    assert y.shape == (1, 64, 64, 32, 2)
    outs = model.apply(params, x, train=True,
                       rngs={"dropout": jax.random.PRNGKey(1)})
    assert outs[4].shape == (1, 64, 64, 32, 2)  # recons
    for o in outs:
        assert np.isfinite(np.asarray(o)).all()


def test_param_count_autopet_config():
    """Reference reports 1.66 M params for the AutoPET config
    (``README.md:213``). thop profiles the eval forward, which excludes the
    teacher decoders and deep-supervision heads; our reparameterizations
    (UpConv-as-dense etc.) are parameter-count-preserving, so the eval-path
    total must land within 1% of the published figure."""
    cfg = VeloxSegConfig()  # AutoPET defaults with depths (2,2,2,2)
    cfg = cfg.replace(depths=(1, 1, 1, 1))  # models_config_autopetii.json
    model = VeloxSeg(cfg)
    x = jnp.zeros((1, 96, 96, 96, 2))
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x, train=True))
    params = variables["params"]

    def count(tree):
        return sum(int(np.prod(v.shape))
                   for v in jax.tree_util.tree_leaves(tree))

    eval_path = count(params["encoder"]) + count(params["decoder"]) - sum(
        count(params["decoder"][k])
        for k in ("out_conv2", "out_conv3", "out_conv4"))
    assert abs(eval_path - 1.66e6) / 1.66e6 < 0.01, \
        f"eval-path param count {eval_path}"
