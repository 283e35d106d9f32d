"""Patch embedding and patch merging (channels-last).

- :class:`PatchEmbed` mirrors MONAI's ``PatchEmbed`` as used by the
  reference transformer branch (``model/Encoder.py:150-156``): a
  non-overlapping conv with kernel == stride == patch_size. With kernel ==
  stride this is a pure space-to-depth reshape followed by one matmul — the
  standard ViT-on-TPU formulation, which lands on the MXU directly.
- :class:`PatchMerging` mirrors ``model/components/attention_utils.py:127-168``:
  8-way stride-2 sampling → LayerNorm → bias-free 1×1 reduction to 2×
  channels.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .basic import he_normal
from .norms import LayerNorm


class PatchEmbed(nn.Module):
    """(B, D, H, W, C) -> (B, D/p, H/p, W/p, embed_dim)."""

    embed_dim: int
    patch_size: int = 4
    use_norm: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.patch_size
        b, d, h, w, c = x.shape
        if d % p or h % p or w % p:
            raise ValueError(f"spatial size {(d, h, w)} not divisible by "
                             f"patch_size {p}")
        x = x.reshape(b, d // p, p, h // p, p, w // p, p, c)
        x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
        x = x.reshape(b, d // p, h // p, w // p, p * p * p * c)
        x = nn.Dense(self.embed_dim, kernel_init=he_normal)(x)
        if self.use_norm:
            x = LayerNorm()(x)
        return x


class PatchMerging(nn.Module):
    """(B, D, H, W, C) -> (B, D/2, H/2, W/2, 2C)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        parts = [
            x[:, a::2, b::2, d::2, :]
            for a in (0, 1) for b in (0, 1) for d in (0, 1)
        ]
        y = jnp.concatenate(parts, axis=-1)
        y = LayerNorm()(y)
        return nn.Dense(2 * c, use_bias=False, kernel_init=he_normal)(y)
