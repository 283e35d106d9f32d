"""Minimal MONAI stand-ins so the reference torch model imports without MONAI.

The reference ``model/`` package needs exactly four MONAI symbols
(``model/Encoder.py:4``, ``model/components/PWA.py:5``,
``model/components/attention_utils.py:6-7``):

- ``monai.networks.blocks.PatchEmbed`` — non-overlapping Conv3d/2d patch
  projection (attribute name ``proj``) with optional norm; for the
  divisible inputs the reference uses, this is exactly
  ``Conv(in, embed_dim, kernel=patch, stride=patch)``.
- ``monai.networks.layers.DropPath`` — stochastic depth (identity in eval;
  per-sample Bernoulli drop in train).
- ``monai.networks.layers.trunc_normal_`` — truncated-normal init.
- ``monai.networks.layers.get_act_layer`` — activation factory ("GELU").

These are our own implementations of the documented behavior (no MONAI
code), used only for parity tests against reference weights.
``install()`` registers them under the ``monai`` module names.
"""

from __future__ import annotations

import sys
import types


def _build_modules():
    import torch
    import torch.nn as nn

    class PatchEmbed(nn.Module):
        def __init__(self, patch_size=2, in_chans=1, embed_dim=48,
                     norm_layer=None, spatial_dims=3):
            super().__init__()
            if isinstance(patch_size, int):
                patch_size = (patch_size,) * spatial_dims
            conv = nn.Conv3d if spatial_dims == 3 else nn.Conv2d
            self.patch_size = patch_size
            self.proj = conv(in_chans, embed_dim, kernel_size=patch_size,
                             stride=patch_size)
            self.norm = norm_layer(embed_dim) if norm_layer is not None \
                else None

        def forward(self, x):
            for s, p in zip(x.shape[2:], self.patch_size):
                if s % p:
                    raise ValueError(
                        f"stub PatchEmbed requires divisible input, got "
                        f"{tuple(x.shape[2:])} vs patch {self.patch_size}")
            x = self.proj(x)
            if self.norm is not None:
                shape = x.shape
                x = self.norm(x.flatten(2).transpose(1, 2))
                x = x.transpose(1, 2).view(shape)
            return x

    class DropPath(nn.Module):
        def __init__(self, drop_prob: float = 0.0, scale_by_keep=True):
            super().__init__()
            self.drop_prob = float(drop_prob)
            self.scale_by_keep = scale_by_keep

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = x.new_empty(shape).bernoulli_(keep)
            if self.scale_by_keep:
                mask = mask / keep
            return x * mask

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        return torch.nn.init.trunc_normal_(tensor, mean, std, a, b)

    def get_act_layer(name):
        if isinstance(name, tuple):
            name, kwargs = name
        else:
            kwargs = {}
        table = {"gelu": nn.GELU, "relu": nn.ReLU,
                 "leakyrelu": nn.LeakyReLU, "prelu": nn.PReLU}
        return table[str(name).lower()](**kwargs)

    return PatchEmbed, DropPath, trunc_normal_, get_act_layer


def install() -> None:
    """Register the stub under ``monai.*`` (no-op if real MONAI exists)."""
    try:
        import monai  # noqa: F401
        return
    except ImportError:
        pass
    if "monai" in sys.modules:
        return

    PatchEmbed, DropPath, trunc_normal_, get_act_layer = _build_modules()

    monai = types.ModuleType("monai")
    networks = types.ModuleType("monai.networks")
    blocks = types.ModuleType("monai.networks.blocks")
    layers = types.ModuleType("monai.networks.layers")
    blocks.PatchEmbed = PatchEmbed
    layers.DropPath = DropPath
    layers.trunc_normal_ = trunc_normal_
    layers.get_act_layer = get_act_layer
    monai.networks = networks
    networks.blocks = blocks
    networks.layers = layers
    sys.modules["monai"] = monai
    sys.modules["monai.networks"] = networks
    sys.modules["monai.networks.blocks"] = blocks
    sys.modules["monai.networks.layers"] = layers
