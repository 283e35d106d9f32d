"""3-D / 2-D pixel shuffle (depth-to-space) for channels-last tensors.

Reference semantics: ``model/components/superpixel.py:15-16`` rearranges
``(b, (c s1 s2 s3), d, h, w) -> (b, c, d*s1, h*s2, w*s3)`` — i.e. the
channel axis factors as ``(c, s1, s2, s3)`` with ``c`` slowest. Here the
input is channels-last ``(B, D, H, W, C*s^3)`` and the channel axis factors
the same way, so a weight-layout-aware import of reference checkpoints stays
a pure transpose.

(The reference 2-D branch drops the batch dim — a latent bug, never live;
our 2-D path is correct.)
"""

from __future__ import annotations

import jax.numpy as jnp


def pixel_shuffle_3d(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """(B, D, H, W, C*s³) -> (B, D*s, H*s, W*s, C)."""
    b, d, h, w, cs = x.shape
    s = scale
    c = cs // (s * s * s)
    if c * s * s * s != cs:
        raise ValueError(f"channels {cs} not divisible by scale³ {s**3}")
    x = x.reshape(b, d, h, w, c, s, s, s)
    # (b, d, s1, h, s2, w, s3, c)
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)
    return x.reshape(b, d * s, h * s, w * s, c)


def pixel_shuffle_2d(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """(B, H, W, C*s²) -> (B, H*s, W*s, C)."""
    b, h, w, cs = x.shape
    s = scale
    c = cs // (s * s)
    if c * s * s != cs:
        raise ValueError(f"channels {cs} not divisible by scale² {s**2}")
    x = x.reshape(b, h, w, c, s, s)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * s, w * s, c)


def block_voxels(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Inverse of :func:`pixel_shuffle_3d` (space-to-depth).

    (B, D·s, H·s, W·s, C) → (B, D, H, W, C·s³) with the channel axis
    factoring (c, s³) — c slowest, matching the head-conv output layout —
    or, for channel-less integer labels, (B, D·s, H·s, W·s) → (B, D, H,
    W, s³). Used by the blocked-head training path: CE/Dice/MSE are
    voxel-wise sums, so computing them in this layout is exact while the
    full-resolution pixel-shuffle transposes (and their backwards)
    disappear from the step; only the gradient-free labels/input move
    through this transform.
    """
    s = scale
    has_c = x.ndim == 5
    if not has_c:
        x = x[..., None]
    b, ds, hs, ws, c = x.shape
    d, h, w = ds // s, hs // s, ws // s
    x = x.reshape(b, d, s, h, s, w, s, c)
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)
    return x.reshape(b, d, h, w, c * s ** 3)
