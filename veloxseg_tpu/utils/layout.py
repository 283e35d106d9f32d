"""Channels-first ↔ channels-last converters.

The framework is channels-last internally (TPU-native); the reference and
its checkpoints are channels-first. These helpers live at the boundary
(data ingest, parity tests, checkpoint import).
"""

from __future__ import annotations

import jax.numpy as jnp


def to_channels_last(x: jnp.ndarray) -> jnp.ndarray:
    """(B, C, *spatial) -> (B, *spatial, C)."""
    return jnp.moveaxis(x, 1, -1)


def to_channels_first(x: jnp.ndarray) -> jnp.ndarray:
    """(B, *spatial, C) -> (B, C, *spatial)."""
    return jnp.moveaxis(x, -1, 1)
