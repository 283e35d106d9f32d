"""Patch embedding and patch merging (channels-last).

- :class:`PatchEmbed` mirrors MONAI's ``PatchEmbed`` as used by the
  reference transformer branch (``model/Encoder.py:150-156``): a
  non-overlapping conv with kernel == stride == patch_size. With kernel ==
  stride this is a pure space-to-depth reshape followed by one matmul — the
  standard ViT-on-TPU formulation, which lands on the MXU directly.
- :class:`PatchMerging` mirrors ``model/components/attention_utils.py:127-168``:
  8-way stride-2 sampling → LayerNorm → bias-free 1×1 reduction to 2×
  channels.

Both support the 2×2×2-packed parity-major stream layout of the packed
attention branch (``nn/pwa_packed.py``) — with identical parameters:

- ``PatchEmbed(packed_out=True)`` folds the pack into the patch
  space-to-depth (one transpose, block-diagonal projection).
- ``PatchMerging``'s 8-neighbor channel concat IS the parity-major packed
  channel layout, so ``packed_in=True`` input needs no gather at all:
  with ``packed_out=False`` the merge is a plain LN+Dense on the packed
  stream (whose grid is exactly the next level's voxel grid); with
  ``packed_out=True`` one outer-parity regroup emits the next level's
  packed stream directly.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from . import pwa_packed
from .basic import DenseParams, he_normal
from .norms import LayerNorm


class _LNParams(nn.Module):
    """Parameter-only stand-in for :class:`LayerNorm` (same names/init)."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return scale, bias


class PatchEmbed(nn.Module):
    """(B, D, H, W, C) -> (B, D/p, H/p, W/p, embed_dim).

    ``packed_out=True`` emits the 2×2×2-packed parity-major stream
    (B, D/2p, H/2p, W/2p, 8·embed_dim) instead — same params.
    """

    embed_dim: int
    patch_size: int = 4
    use_norm: bool = False
    packed_out: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.patch_size
        b, d, h, w, c = x.shape
        if d % p or h % p or w % p:
            raise ValueError(f"spatial size {(d, h, w)} not divisible by "
                             f"patch_size {p}")
        if self.packed_out:
            if d % (2 * p) or h % (2 * p) or w % (2 * p):
                raise ValueError(
                    f"packed PatchEmbed needs dims divisible by {2 * p}")
            # voxel v = 2q + r, voxel covers input [v·p, (v+1)·p):
            # D factors (q, r, i) row-major.
            x = x.reshape(b, d // (2 * p), 2, p, h // (2 * p), 2, p,
                          w // (2 * p), 2, p, c)
            x = x.transpose(0, 1, 4, 7, 2, 5, 8, 3, 6, 9, 10)
            x = x.reshape(b, d // (2 * p), h // (2 * p), w // (2 * p),
                          8 * p ** 3 * c)
            kern, bias = DenseParams(self.embed_dim, p ** 3 * c,
                                     name="Dense_0")()
            y = x @ pwa_packed.dense_parity(kern).astype(x.dtype)
            y = y + pwa_packed.tile8(bias).astype(y.dtype)
            if self.use_norm:
                s, t = _LNParams(self.embed_dim, name="LayerNorm_0")()
                y = pwa_packed.seg_layer_norm(y, 8)
                y = (y * pwa_packed.tile8(s).astype(y.dtype)
                     + pwa_packed.tile8(t).astype(y.dtype))
            return y
        x = x.reshape(b, d // p, p, h // p, p, w // p, p, c)
        x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
        x = x.reshape(b, d // p, h // p, w // p, p * p * p * c)
        x = nn.Dense(self.embed_dim, kernel_init=he_normal)(x)
        if self.use_norm:
            x = LayerNorm()(x)
        return x


class PatchMerging(nn.Module):
    """(B, D, H, W, C) -> (B, D/2, H/2, W/2, 2C); packed in/out variants
    per the module docstring."""

    packed_in: bool = False
    packed_out: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.packed_in:
            c8 = x.shape[-1]            # 8·C of the incoming level
            c = c8 // 8
            scale, shift = _LNParams(c8, name="LayerNorm_0")()
            kern, _ = DenseParams(2 * c, c8, use_bias=False,
                                  name="Dense_0")()
            if self.packed_out:
                b, s0, s1, s2, _ = x.shape
                # outer-parity regroup: packed grid of this level factors
                # (q, r') per axis; r' is the next level's parity.
                y = x.reshape(b, s0 // 2, 2, s1 // 2, 2, s2 // 2, 2, c8)
                y = y.transpose(0, 1, 3, 5, 2, 4, 6, 7)
                y = y.reshape(b, s0 // 2, s1 // 2, s2 // 2, 8 * c8)
                y = pwa_packed.seg_layer_norm(y, 8)
                y = (y * pwa_packed.tile8(scale).astype(y.dtype)
                     + pwa_packed.tile8(shift).astype(y.dtype))
                return y @ pwa_packed.dense_parity(kern).astype(y.dtype)
            # packed grid == next level's voxel grid, and the packed
            # channel layout == the merge's 8-neighbor concat: plain LN.
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
            y = ((xf - mean) / jnp.sqrt(var + 1e-6)).astype(x.dtype)
            y = y * scale.astype(x.dtype) + shift.astype(x.dtype)
            return y @ kern.astype(y.dtype)
        c = x.shape[-1]
        parts = [
            x[:, a::2, b::2, d::2, :]
            for a in (0, 1) for b in (0, 1) for d in (0, 1)
        ]
        y = jnp.concatenate(parts, axis=-1)
        y = LayerNorm()(y)
        y = nn.Dense(2 * c, use_bias=False, kernel_init=he_normal)(y)
        if self.packed_out:
            from ..ops import packed_conv
            return packed_conv.pack_s2d(y)
        return y
