"""Zoo smoke tests: every registered baseline builds from a reference-style
config dict and produces correctly-shaped logits (the reference's own
"speed_test as smoke test" role, SURVEY §4)."""

import jax
import jax.numpy as jnp
import pytest

from veloxseg_tpu.models.registry import available_models, load_model

pytestmark = pytest.mark.slow  # full-model XLA compiles

# (name, config entry, input spatial, in_ch, out_ch)
CASES = [
    ("UNet", {"in_channels": 2, "out_channels": 2}, (32, 32, 32), 2, 2),
    ("VNet", {"in_channels": 2, "out_channels": 2}, (32, 32, 32), 2, 2),
    ("MedNeXt", {"num_input_channels": 2, "num_classes": 2},
     (32, 32, 32), 2, 2),
    ("SlimUNETR", {"in_channels": 2, "out_channels": 2, "embed_dim": 96,
                   "embedding_dim": 1}, (32, 32, 32), 2, 2),
    ("SegFormer", {"in_channels": 2, "num_classes": 2}, (32, 32, 32), 2, 2),
    ("SuperLightNet", {"init_channels": 2, "class_nums": 2,
                       "depths_unidirectional": "small"},
     (32, 32, 32), 2, 2),
    ("UNETR", {"in_channels": 2, "out_channels": 2,
               "img_size": [32, 32, 32]}, (32, 32, 32), 2, 2),
    ("U-RWKV", {"input_channel": 2, "num_classes": 2}, (32, 32, 32), 2, 2),
    ("HDense", {"in_channels": 2, "n_cls": 2, "image_size": [32, 32, 32],
                "transformer_depth": 8}, (32, 32, 32), 2, 2),
    ("U-KAN", {"num_classes": 2, "input_channels": 2,
               "img_size": [32, 32, 32],
               "embed_dims": [64, 96, 128]}, (32, 32, 32), 2, 2),
    ("UNETRpp", {"in_channels": 2, "out_channels": 2,
                 "patch_size": [32, 32, 32], "feature_size": 16,
                 "hidden_size": 256, "num_heads": 4,
                 "depths": [1, 1, 1, 1], "dims": [32, 64, 128, 256],
                 "do_ds": True}, (32, 32, 32), 2, 2),
    ("SwinUNETR", {"in_channels": 2, "out_channels": 2}, (32, 32, 32),
     2, 2),
    ("A2FSeg", {"modality_num": 2, "base_num_features": 16,
                "num_classes": 2, "num_pool": 5}, (32, 32, 32), 2, 2),
    ("NestedFormer", {"model_num": 2, "out_channels": 2,
                      "image_size": [48, 48, 48],
                      "window_size": [3, 3, 3]}, (48, 48, 48), 2, 2),
    ("VSmTrans", {"in_channels": 2, "out_channels": 2, "feature_size": 24,
                  "split_size": [1, 2, 3, 4], "window_size": 6,
                  "num_heads": [3, 6, 12, 24], "img_size": [32, 32, 32],
                  "depths": [2, 2, 2, 2], "patch_size": [2, 2, 2],
                  "do_ds": True}, (32, 32, 32), 2, 2),
    ("HCMA-UNet", {"in_channels": 2, "n_classes": 2,
                   "patch_ini": [32, 32, 32], "predict_mode": True},
     (32, 32, 32), 2, 2),
]


@pytest.mark.full
@pytest.mark.parametrize("name,cfg,size,in_ch,out_ch", CASES,
                         ids=[c[0] for c in CASES])
def test_zoo_forward(name, cfg, size, in_ch, out_ch):
    model = load_model(name, {name: cfg})
    x = jnp.zeros((1, *size, in_ch), jnp.float32)
    variables = jax.jit(model.init, static_argnames="train")(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)}, x, train=True)
    y = jax.jit(model.apply, static_argnames="train")(
        variables, x, train=False)
    assert y.shape == (1, *size, out_ch), f"{name}: {y.shape}"


def test_registry_lists_models():
    from veloxseg_tpu.models.registry import _ensure_builtin_imports
    _ensure_builtin_imports()
    names = available_models()
    for expected in ("VeloxSeg", "UNet", "VNet", "MedNeXt", "SlimUNETR",
                     "SegFormer", "SuperLightNet"):
        assert expected in names, names


def test_unknown_model_raises():
    with pytest.raises(ValueError):
        load_model("NoSuchModel", {})


@pytest.mark.slow
def test_zoo_micro_smoke():
    """Default-tier (not ``full``) coverage of the zoo registry path: two
    representative baselines build and run forward — keeps `pytest -m
    "not full"` exercising registry→construct→apply without the 17-model
    sweep."""
    for name, cfg, size, in_ch, out_ch in [c for c in CASES
                                           if c[0] in ("MedNeXt",
                                                       "SlimUNETR")]:
        model = load_model(name, {name: cfg})
        x = jnp.zeros((1, *size, in_ch), jnp.float32)
        variables = jax.jit(model.init, static_argnames="train")(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)}, x, train=False)
        out = jax.jit(
            lambda v, x: model.apply(v, x, train=False))(variables, x)
        first = out[0] if isinstance(out, (list, tuple)) else out
        assert first.shape == (1, *size, out_ch)
