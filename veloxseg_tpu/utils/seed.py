"""Determinism (reference ``utils/seed.py`` parity, C17).

The reference seeds python/numpy/torch and sets cudnn deterministic
(seed 12345, ``utils/seed.py:6-14``). JAX is deterministic by
construction: all randomness flows through explicit PRNG keys, so
"seeding everything" reduces to seeding the host-side generators and
producing the root key. An optional NaN-debug mode replaces the
reference's cudnn knobs.
"""

from __future__ import annotations

import random

import numpy as np

DEFAULT_SEED = 12345


def seed_everything(seed: int = DEFAULT_SEED):
    """Seed host RNGs and return the root JAX PRNG key."""
    random.seed(seed)
    np.random.seed(seed)
    import jax
    return jax.random.PRNGKey(seed)


def enable_nan_debugging(enable: bool = True):
    """jax_debug_nans: fail fast on NaNs (SURVEY §5 race/sanitizer slot)."""
    import jax
    jax.config.update("jax_debug_nans", enable)
