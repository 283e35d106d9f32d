"""Numerical parity: reference PyTorch zoo models vs the flax rewrites.

Same evidence chain as ``test_parity_torch.py`` for the flagship, applied
to zoo baselines: random-init the reference torch model (CPU), map its
state dict onto the flax model via ``interop.zoo_import``, assert forward
agreement on fixed inputs. Covered: MedNeXt (ConvNeXt-style 3-D UNet with
depthwise/transpose convs, GroupNorm, and the asymmetric up-pad —
``compared_model/MedNeXt``).
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from veloxseg_tpu.interop.ref_model import DEFAULT_REFERENCE  # noqa: E402
from veloxseg_tpu.interop.zoo_import import convert_zoo_state_dict  # noqa: E402

REF_ZOO = os.path.join(DEFAULT_REFERENCE, "compared_model")

pytestmark = [pytest.mark.slow] + (
    [] if os.path.isdir(os.path.join(REF_ZOO, "MedNeXt"))
    else [pytest.mark.skip(reason="reference zoo unavailable")])


def _load_ref_mednext(in_ch: int, n_classes: int):
    if REF_ZOO not in sys.path:
        sys.path.insert(0, REF_ZOO)
    import importlib
    mod = importlib.import_module("MedNeXt.create_mednext_v1")
    model = mod.create_mednextv1_small(in_ch, n_classes, kernel_size=3,
                                       ds=False)
    model.eval()
    return model


def test_mednext_forward_parity():
    from veloxseg_tpu.models.zoo.mednext import MedNeXt

    torch.manual_seed(0)
    in_ch, n_classes = 2, 2
    ref = _load_ref_mednext(in_ch, n_classes)

    flax_model = MedNeXt(n_classes=n_classes)
    x_np = np.random.default_rng(0).standard_normal(
        (1, 32, 32, 32, in_ch)).astype(np.float32)
    template = jax.jit(flax_model.init, static_argnames="train")(
        jax.random.PRNGKey(0), jnp.asarray(x_np), train=False)["params"]
    params = convert_zoo_state_dict("MedNeXt", ref.state_dict(), template)

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(
            np.transpose(x_np, (0, 4, 1, 2, 3))))
    ref_out = np.transpose(ref_out.numpy(), (0, 2, 3, 4, 1))

    out = jax.jit(flax_model.apply, static_argnames="train")(
        {"params": params}, jnp.asarray(x_np), train=False)
    np.testing.assert_allclose(np.asarray(out), ref_out,
                               atol=2e-4, rtol=2e-4)


def test_mednext_converter_covers_every_key():
    """Every reference parameter maps (no silent drops)."""
    ref = _load_ref_mednext(2, 2)
    converted = convert_zoo_state_dict("MedNeXt", ref.state_dict())
    # (the reference's 1-element ``dummy_tensor`` gradient-checkpointing
    # crutch is deliberately unmapped)
    n_src = sum(v.numel() for k, v in ref.state_dict().items()
                if not k.startswith("dummy"))

    def count(node):
        if isinstance(node, dict):
            return sum(count(v) for v in node.values())
        return int(np.prod(node.shape))

    assert count(converted) == n_src


def _load_ref_slim(in_ch: int, n_classes: int):
    if REF_ZOO not in sys.path:
        sys.path.insert(0, REF_ZOO)
    import importlib
    mod = importlib.import_module("SlimUNETR.SlimUNETR")
    model = mod.SlimUNETR(in_channels=in_ch, out_channels=n_classes,
                          embed_dim=96, embedding_dim=27,
                          channels=(24, 48, 60), blocks=(1, 2, 3, 2),
                          heads=(1, 2, 4, 4), r=(4, 2, 2, 1), dropout=0.0)
    # train mode: BatchNorm uses batch statistics (= our BatchNormNoTrack);
    # dropout=0 keeps the forward deterministic.
    model.train()
    return model


def test_slim_unetr_forward_parity():
    from veloxseg_tpu.models.zoo.slim_unetr import SlimUNETR

    torch.manual_seed(0)
    in_ch, n_classes = 2, 2
    ref = _load_ref_slim(in_ch, n_classes)

    flax_model = SlimUNETR(out_channels=n_classes, embedding_dim=27,
                           dropout=0.0)
    x_np = np.random.default_rng(1).standard_normal(
        (2, 96, 96, 96, in_ch)).astype(np.float32)
    template = jax.jit(flax_model.init, static_argnames="train")(
        jax.random.PRNGKey(0), jnp.asarray(x_np), train=False)["params"]
    params = convert_zoo_state_dict("SlimUNETR", ref.state_dict(), template)

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(
            np.transpose(x_np, (0, 4, 1, 2, 3))))
    ref_out = np.transpose(ref_out.numpy(), (0, 2, 3, 4, 1))

    out = jax.jit(flax_model.apply, static_argnames="train")(
        {"params": params}, jnp.asarray(x_np), train=False)
    np.testing.assert_allclose(np.asarray(out), ref_out,
                               atol=5e-4, rtol=5e-4)


def test_slim_unetr_converter_covers_every_key():
    ref = _load_ref_slim(2, 2)
    converted = convert_zoo_state_dict("SlimUNETR", ref.state_dict())
    n_src = sum(v.numel() for k, v in ref.state_dict().items()
                if ".running_" not in k
                and not k.endswith("num_batches_tracked"))

    def count(node):
        if isinstance(node, dict):
            return sum(count(v) for v in node.values())
        return int(np.prod(node.shape))

    assert count(converted) == n_src
