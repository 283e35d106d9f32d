"""Parameter-count evidence for the 4 MONAI built-ins.

The reference registers real MONAI ``BasicUNet``/``VNet``/``UNETR``/
``SwinUNETR`` (``utils/load_model.py:10-24``); MONAI is not installed
here, so no imported-weight numerical parity chain is possible for these
4 registry entries (COMPONENTS.md "Known gaps"). This module pins what
*is* verifiable without MONAI:

1. **Analytic counts** (BasicUNet, VNet): the expected parameter count is
   derived *in this file* from MONAI's documented architecture — layer
   kernel sizes, feature widths, norm affine parameters — not from the
   flax implementation. A structural divergence (missing conv, wrong
   width, wrong skip wiring) changes the count and fails the test.
2. **Published anchors** (UNETR, SwinUNETR): instantiated at the papers'
   configs, the flax models must land on the published totals — UNETR
   92.58M (Hatamizadeh et al., WACV 2022, ViT-B/16 + conv decoder at
   in=1/out=14/96³/feature 16) and Swin UNETR 62.19M (Hatamizadeh et
   al., BrainLes 2021, feature 48). Tolerances are documented per-model
   below.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _count(model, shape):
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros(shape),
                           train=False))
    return sum(int(np.prod(leaf.shape))
               for leaf in jax.tree_util.tree_leaves(variables))


def test_basic_unet_analytic_count():
    """MONAI BasicUNet, features (32, 32, 64, 128, 256, 32), 3D.

    Documented architecture: TwoConv = 2 × (conv3³+bias → instance norm
    affine → act); encoder = TwoConv stem + 4 × (maxpool + TwoConv);
    decoder UpCat = deconv k2 s2 (+bias, half channels except the last,
    which keeps them) + concat skip + TwoConv; 1×1 head with bias.
    """
    from veloxseg_tpu.models.zoo.basic_unet import BasicUNet

    in_ch, out_ch = 2, 2
    f = (32, 32, 64, 128, 256, 32)

    def twoconv(cin, cout):
        # (27·cin·cout + cout bias + 2·cout IN affine) then same cout→cout
        return (27 * cin * cout + cout + 2 * cout) \
            + (27 * cout * cout + cout + 2 * cout)

    def deconv(cin, cout):
        return 8 * cin * cout + cout

    expected = (
        twoconv(in_ch, f[0])
        + twoconv(f[0], f[1]) + twoconv(f[1], f[2])
        + twoconv(f[2], f[3]) + twoconv(f[3], f[4])
        # UpCat 4..2: deconv halves channels, TwoConv(skip+up → out)
        + deconv(f[4], f[4] // 2) + twoconv(f[3] + f[4] // 2, f[3])
        + deconv(f[3], f[3] // 2) + twoconv(f[2] + f[3] // 2, f[2])
        + deconv(f[2], f[2] // 2) + twoconv(f[1] + f[2] // 2, f[1])
        # last UpCat: halves=False (deconv keeps f[1]), out width f[5]
        + deconv(f[1], f[1]) + twoconv(f[0] + f[1], f[5])
        + f[5] * out_ch + out_ch)

    assert _count(BasicUNet(out_channels=out_ch),
                  (1, 32, 32, 32, in_ch)) == expected


def test_vnet_analytic_count():
    """MONAI VNet: 5³ conv blocks (conv+bias+BN affine), 16→256 stride-2
    down path with 1/2/3/2 LUConvs, transpose-conv up path (out//2
    channels) with 2/2/1/1 LUConvs, 5³ + 1³ output head."""
    from veloxseg_tpu.models.zoo.vnet import VNet

    in_ch, out_ch = 2, 2

    def lu(c):
        return 125 * c * c + c + 2 * c

    def down(c, n):
        return (8 * (c // 2) * c + c + 2 * c) + n * lu(c)

    def up(cin, cout, n):
        half = cout // 2
        return (8 * cin * half + half + 2 * half) + n * lu(cout)

    expected = (
        125 * in_ch * 16 + 16 + 32                       # InputTransition
        + down(32, 1) + down(64, 2) + down(128, 3) + down(256, 2)
        + up(256, 256, 2) + up(256, 128, 2) + up(128, 64, 1) + up(64, 32, 1)
        + 125 * 32 * out_ch + out_ch + 2 * out_ch        # out conv5³ + BN
        + out_ch * out_ch + out_ch)                      # out conv1³
    assert _count(VNet(out_channels=out_ch),
                  (1, 32, 32, 32, in_ch)) == expected


def test_unetr_published_param_count():
    """UNETR at the paper config (in=1, out=14, 96³, feature 16) must hit
    the published 92.58M. Tolerance 2%: this build keeps flax's qkv/out
    projection biases where MONAI's SABlock defaults qkv_bias=False
    (+28k, zero-initialized — functionally identical), and rounding in
    the published figure itself."""
    from veloxseg_tpu.models.zoo.unetr import UNETR

    got = _count(UNETR(out_channels=14), (1, 96, 96, 96, 1))
    assert abs(got - 92_580_000) / 92_580_000 < 0.02, got


def test_swin_unetr_published_param_count():
    """Swin UNETR at the BraTS paper config (feature 48, in=4, out=3)
    must hit the published 62.19M. Tolerance 0.5% (observed −0.13%)."""
    from veloxseg_tpu.models.zoo.swin_unetr import SwinUNETR

    got = _count(SwinUNETR(out_channels=3, feature_size=48),
                 (1, 64, 64, 64, 4))
    assert abs(got - 62_190_000) / 62_190_000 < 0.005, got
