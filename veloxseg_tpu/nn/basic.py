"""Basic building blocks: init, activations, dropout-path, FFN, grouped conv.

All modules take channels-last tensors ``(B, D, H, W, C)``.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

# He (kaiming-normal) init with leaky-relu negative slope 1e-2, fan_in — the
# reference's InitWeights_He (``model/components/initialization.py:3-14``).
_HE_NEG_SLOPE = 1e-2
he_normal = nn.initializers.variance_scaling(
    scale=2.0 / (1.0 + _HE_NEG_SLOPE ** 2), mode="fan_in",
    distribution="normal")


def get_act(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Activation factory mirroring ``common_function.get_act``."""
    name = name.lower()
    table = {
        "relu": nn.relu,
        "relu6": lambda x: jnp.clip(x, 0.0, 6.0),
        "leakyrelu": lambda x: nn.leaky_relu(x, negative_slope=0.2),
        "gelu": lambda x: nn.gelu(x, approximate=False),
        "hswish": nn.hard_swish,
    }
    if name not in table:
        raise NotImplementedError(f"activation layer [{name}] is not found")
    return table[name]


class DropPath(nn.Module):
    """Per-sample stochastic depth."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class GroupedConv3d(nn.Module):
    """Grouped 3-D convolution, channels-last, SAME-style static padding.

    Maps to one XLA convolution with ``feature_group_count`` — the TPU
    equivalent of the reference's ``nn.Conv3d(..., groups=g)`` inside JLC
    blocks (``model/components/conv_blocks.py:50-62``).
    """

    features: int
    kernel_size: Tuple[int, int, int]
    strides: Tuple[int, int, int] = (1, 1, 1)
    padding: Sequence[Tuple[int, int]] | str = "SAME"
    groups: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        if in_ch % self.groups or self.features % self.groups:
            raise ValueError(
                f"channels ({in_ch}->{self.features}) not divisible by "
                f"groups {self.groups}")
        kernel = self.param(
            "kernel", he_normal,
            (*self.kernel_size, in_ch // self.groups, self.features))
        y = lax.conv_general_dilated(
            x, kernel.astype(x.dtype),
            window_strides=self.strides,
            padding=self.padding,
            feature_group_count=self.groups,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class DenseParams(nn.Module):
    """Parameter-only stand-in for ``nn.Dense`` (identical param names,
    shapes, init) — lets callers merge several logical Dense layers into
    one matmul at trace time while keeping checkpoint compatibility."""

    features: int
    in_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", he_normal,
                            (self.in_features, self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        return kernel, bias


class FFN(nn.Module):
    """1×1-conv feed-forward: expand → act → project (+dropout).

    Reference: ``model/components/attention_utils.py:45-71``.
    """

    expansion_ratio: int = 4
    dropout_rate: float = 0.0
    act: str = "GELU"

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        c = x.shape[-1]
        y = nn.Dense(c * self.expansion_ratio, kernel_init=he_normal)(x)
        y = get_act(self.act)(y)
        y = nn.Dropout(self.dropout_rate)(y, deterministic=deterministic)
        y = nn.Dense(c, kernel_init=he_normal)(y)
        y = nn.Dropout(self.dropout_rate)(y, deterministic=deterministic)
        return y
