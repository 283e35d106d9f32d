"""Gram-matrix reduction — the SDKT statistic.

Reference: ``model/components/common_function.py:8-14`` computes
``einsum('b m hwd, b n hwd -> b m n') / (c*h*w*d)`` on channels-first
features. Channels-last equivalent: flatten spatial, one big
``(C, S) @ (S, C)`` matmul per batch element — lands directly on the MXU.
Accumulation is forced to fp32 regardless of input dtype.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax import lax


def gram_matrix(x: jnp.ndarray) -> jnp.ndarray:
    """(B, *spatial, C) -> (B, C, C), normalized by C * prod(spatial)."""
    b = x.shape[0]
    c = x.shape[-1]
    spatial = math.prod(x.shape[1:-1])
    xf = x.reshape(b, spatial, c)
    g = lax.dot_general(
        xf, xf,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )
    return g / float(c * spatial)
