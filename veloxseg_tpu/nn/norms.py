"""Normalization layers (channels-last).

- :class:`LayerNorm` — normalizes the channel (last) axis only, eps 1e-6,
  matching the reference's dual-format LayerNorm
  (``model/components/attention_utils.py:11-43``; both its formats normalize
  over channels, so channels-last needs a single implementation).
- :class:`InstanceNorm` — per-(sample, channel) normalization over spatial
  axes with no affine parameters, matching ``nn.InstanceNorm3d`` defaults
  (affine=False, eps 1e-5) used throughout the reference conv path
  (``model/components/common_function.py:62-66``).

Statistics are always computed in fp32 and cast back, so bf16 activations
stay stable.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class LayerNorm(nn.Module):
    """Channel-axis LayerNorm with learnable scale/bias, eps 1e-6."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) / jnp.sqrt(var + self.eps)
        y = y.astype(x.dtype)
        return y * scale.astype(x.dtype) + bias.astype(x.dtype)


class InstanceNorm(nn.Module):
    """Spatial-axes normalization per sample and channel, no affine.

    Implemented as two fused fp32 reductions (Σx, Σx²) plus one fused
    elementwise normalize — never materializing an fp32 copy of the
    activation (the straightforward ``x.astype(f32)`` two-pass form costs
    ~30 ms/step of convert copies + reduce fusions at 128³/bs16)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        axes = tuple(range(1, x.ndim - 1))
        count = 1.0
        for a in axes:
            count *= x.shape[a]
        xf = x.astype(jnp.float32)  # fused into the reduces, not stored
        s1 = jnp.sum(xf, axis=axes, keepdims=True)
        s2 = jnp.sum(jnp.square(xf), axis=axes, keepdims=True)
        mean = s1 / count
        var = s2 / count - jnp.square(mean)
        scale = jax.lax.rsqrt(jnp.maximum(var, 0.0) + self.eps)
        return (xf * scale - mean * scale).astype(x.dtype)
