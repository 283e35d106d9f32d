"""Linear (bi/tri-linear) resize with ``align_corners=True`` semantics.

The reference relies on ``F.interpolate(..., mode='trilinear',
align_corners=True)`` in two hot places: deep-supervision prediction
upscaling (``model/VeloxSeg.py:177-184``) and PWA window scattering
(``model/components/PWA.py:190``). ``jax.image.resize`` implements
half-pixel (align_corners=False) sampling only, so we build the
align-corners interpolation operator ourselves.

TPU-first design: 1-D linear interpolation with static sizes is a dense
matrix — output = W @ input along that axis, with W of shape
``(n_out, n_in)`` having ≤2 non-zeros per row. Separable N-D interpolation
is then a chain of small per-axis contractions that XLA maps onto the MXU
and fuses — no gathers, no dynamic indexing.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from jax import lax


@functools.lru_cache(maxsize=None)
def _interp_matrix_np(n_in: int, n_out: int) -> np.ndarray:
    """Dense 1-D linear interpolation matrix, align_corners=True."""
    if n_in == n_out:
        return np.eye(n_out, dtype=np.float32)
    w = np.zeros((n_out, n_in), dtype=np.float32)
    if n_out == 1 or n_in == 1:
        # align_corners=True with a single sample maps to source index 0.
        w[:, 0] = 1.0
        return w
    scale = (n_in - 1) / (n_out - 1)
    for i in range(n_out):
        src = i * scale
        lo = int(np.floor(src))
        hi = min(lo + 1, n_in - 1)
        frac = src - lo
        w[i, lo] += 1.0 - frac
        w[i, hi] += frac
    return w


def interp_matrix(n_in: int, n_out: int, dtype=jnp.float32) -> jnp.ndarray:
    """1-D align-corners linear interpolation operator ``(n_out, n_in)``."""
    return jnp.asarray(_interp_matrix_np(int(n_in), int(n_out)), dtype=dtype)


def resize_trilinear(
    x: jnp.ndarray,
    out_size: Sequence[int],
    spatial_axes: Tuple[int, ...] = (1, 2, 3),
) -> jnp.ndarray:
    """Resize ``x`` along ``spatial_axes`` to ``out_size`` (align_corners).

    Works for any rank; by default resizes axes (1, 2, 3) of a channels-last
    ``(B, D, H, W, C)`` tensor. Interpolation is computed in the input dtype
    (weights are exact in bf16 only for power-of-two ratios; pass fp32 input
    when exactness matters).
    """
    if len(out_size) != len(spatial_axes):
        raise ValueError("out_size and spatial_axes must have equal length")
    for axis, n_out in zip(spatial_axes, out_size):
        n_in = x.shape[axis]
        if n_in == n_out:
            continue
        w = interp_matrix(n_in, n_out, dtype=x.dtype)
        x = jnp.moveaxis(
            jnp.tensordot(w, x, axes=((1,), (axis,)),
                          precision=lax.Precision.HIGHEST), 0, axis)
    return x
