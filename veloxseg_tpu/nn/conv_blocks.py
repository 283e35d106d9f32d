"""JLC (Johnson-Lindenstrauss-guided Convolution) blocks and up/down sampling.

Reference semantics (``model/components/conv_blocks.py``):

- ``DownConv``: conv(kernel 2p−1, stride p, pad p−1) + InstanceNorm.
- ``UpConv``: ConvTranspose(kernel 2, stride 2) + InstanceNorm. With
  kernel == stride the transpose conv writes one independent 2×2×2 block
  per input voxel, which is exactly a 1×1 projection to ``out·8`` channels
  followed by a 3-D pixel shuffle — a single MXU matmul instead of a
  scatter-style transposed convolution. We implement it that way.
- ``JLC``: residual sum of parallel grouped convs (k ∈ kernel_sizes, each
  +IN+act), then a residual 1×1 channel-MLP (IN → expand → act → project →
  dropout). Group count is the JL knob (channels / min_dim_group).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.pixel_shuffle import pixel_shuffle_3d
from .basic import GroupedConv3d, get_act, he_normal
from .norms import InstanceNorm


class DownConv(nn.Module):
    """Strided overlapping patch downsample + InstanceNorm."""

    features: int
    patch_size: int = 2
    groups: int = 1
    use_norm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.patch_size
        k = 2 * p - 1
        y = GroupedConv3d(
            features=self.features,
            kernel_size=(k, k, k),
            strides=(p, p, p),
            padding=[(p - 1, p - 1)] * 3,
            groups=self.groups,
        )(x)
        if self.use_norm:
            y = InstanceNorm()(y)
        return y


class UpConv(nn.Module):
    """2× upsample: 1×1 conv to features·8 + pixel shuffle + InstanceNorm.

    Mathematically identical to ConvTranspose(kernel=2, stride=2) — same
    parameter count, MXU-friendly layout.
    """

    features: int
    up_rate: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        r = self.up_rate
        y = nn.Dense(self.features * r ** 3, kernel_init=he_normal)(x)
        y = pixel_shuffle_3d(y, r)
        return InstanceNorm()(y)


class JLC(nn.Module):
    """One JLC block (multi-kernel grouped spatial mix + channel MLP)."""

    kernel_sizes: Tuple[int, ...] = (1, 3, 5)
    groups: int = 1
    expansion_factor: int = 4
    activation: str = "gelu"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        c = x.shape[-1]
        act = get_act(self.activation)

        branches = []
        multi = len(self.kernel_sizes) > 1
        for k in self.kernel_sizes:
            y = GroupedConv3d(
                features=c, kernel_size=(k, k, k),
                padding=[(k // 2, k // 2)] * 3, groups=self.groups)(x)
            if multi:
                y = act(InstanceNorm()(y))
            branches.append(y)
        out = x + sum(branches)

        # Residual channel MLP: IN → expand → act → project → dropout.
        z = InstanceNorm()(out)
        z = nn.Dense(c * self.expansion_factor, kernel_init=he_normal)(z)
        z = act(z)
        z = nn.Dense(c, kernel_init=he_normal)(z)
        z = nn.Dropout(self.dropout)(z, deterministic=deterministic)
        return out + z


class JLCLayer(nn.Module):
    """``depth`` stacked JLC blocks."""

    depth: int = 1
    kernel_sizes: Tuple[int, ...] = (1, 3, 5)
    groups: int = 1
    expansion_factor: int = 4
    activation: str = "gelu"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        for _ in range(self.depth):
            x = JLC(
                kernel_sizes=self.kernel_sizes,
                groups=self.groups,
                expansion_factor=self.expansion_factor,
                activation=self.activation,
                dropout=self.dropout,
            )(x, deterministic)
        return x
