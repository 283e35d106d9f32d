"""Shared channels-last building blocks for the baseline zoo.

Torch-semantic wrappers (padding = k//2, torch-style transposed convs) so
architecture ports read like their specs. All modules take (B, D, H, W, C).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from ...nn.basic import he_normal


class Conv3d(nn.Module):
    """Torch-style Conv3d: explicit k//2 padding, optional stride/groups."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: Optional[int] = None
    groups: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        pad = self.padding if self.padding is not None else k // 2
        in_ch = x.shape[-1]
        kernel = self.param("kernel", he_normal,
                            (k, k, k, in_ch // self.groups, self.features))
        y = lax.conv_general_dilated(
            x, kernel.astype(x.dtype),
            window_strides=(self.stride,) * 3,
            padding=[(pad, pad)] * 3,
            feature_group_count=self.groups,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(y.dtype)
        return y


class ConvTranspose3d(nn.Module):
    """Torch-style ConvTranspose3d(kernel, stride, padding).

    Implemented as an input-dilated convolution (the standard equivalence):
    out = conv(x dilated by stride, kernel flipped, pad = k-1-p). For the
    common kernel==stride case this reduces to matmul + pixel-shuffle in
    :class:`veloxseg_tpu.nn.conv_blocks.UpConv`; this class covers the
    general (overlapping) case, e.g. MedNeXt's k=3 s=2 depthwise up.
    """

    features: int
    kernel_size: int = 2
    stride: int = 2
    padding: int = 0
    groups: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        k, s, p = self.kernel_size, self.stride, self.padding
        in_ch = x.shape[-1]
        kernel = self.param("kernel", he_normal,
                            (k, k, k, in_ch // self.groups, self.features))
        # conv(dilate(x, s), flip(kernel), pad = k-1-p) has output size
        # (i-1)*s + 2(k-1-p) - k + 2 = (i-1)*s - 2p + k — exact torch size.
        pad = k - 1 - p
        y = lax.conv_general_dilated(
            x, jnp.flip(kernel, axis=(0, 1, 2)).astype(x.dtype),
            window_strides=(1, 1, 1),
            padding=[(pad, pad)] * 3,
            lhs_dilation=(s, s, s),
            feature_group_count=self.groups,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(y.dtype)
        return y


class GroupNorm(nn.Module):
    """GroupNorm with affine (torch parity), fp32 stats."""

    num_groups: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        g = self.num_groups
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        shape = x.shape
        xf = x.astype(jnp.float32).reshape(*shape[:-1], g, c // g)
        axes = tuple(range(1, xf.ndim - 2)) + (xf.ndim - 1,)
        mean = jnp.mean(xf, axis=axes, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=axes, keepdims=True)
        y = ((xf - mean) / jnp.sqrt(var + self.eps)).reshape(shape)
        return y.astype(x.dtype) * scale.astype(x.dtype) + \
            bias.astype(x.dtype)


class BatchNormNoTrack(nn.Module):
    """BatchNorm with affine that always uses current-batch statistics.

    TPU-native simplification of ``nn.BatchNorm3d``: no running-stat state
    (the framework is stateless/pure); equivalent to torch's
    ``track_running_stats=False`` mode. Documented delta from the
    reference baselines that use BN.
    """

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        xf = x.astype(jnp.float32)
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(xf, axis=axes)
        var = jnp.mean(jnp.square(xf - mean), axis=axes)
        y = (xf - mean) / jnp.sqrt(var + self.eps)
        return y.astype(x.dtype) * scale.astype(x.dtype) + \
            bias.astype(x.dtype)


def max_pool3d(x, window: int, stride: Optional[int] = None):
    stride = stride or window
    return nn.max_pool(x, (window,) * 3, strides=(stride,) * 3)


def avg_pool3d(x, window: int, stride: Optional[int] = None):
    stride = stride or window
    return nn.avg_pool(x, (window,) * 3, strides=(stride,) * 3)


class ChannelDropout(nn.Module):
    """torch Dropout3d parity: drops whole channels per sample."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool):
        if self.rate == 0.0 or deterministic:
            return x
        rng = self.make_rng("dropout")
        keep = 1.0 - self.rate
        mask = jax.random.bernoulli(
            rng, keep, (x.shape[0],) + (1,) * (x.ndim - 2) + (x.shape[-1],))
        return jnp.where(mask, x / keep, 0.0)
