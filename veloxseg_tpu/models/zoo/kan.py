"""KAN linear layer (B-spline) — JAX implementation of the efficient-KAN
formulation used by the reference's U-KAN (``compared_model/UKAN/kan.py``).

``y = base_weight · SiLU(x) + Σ_g scaled_spline_weight[·,·,g] · B_g(x)``
with a uniform degree-3 B-spline basis (grid_size 5, range [−1, 1]; the
reference never updates the grid, so it is a static constant here).

Init note: the reference initializes spline weights by least-squares
fitting random curves (``curve2coeff``); we use a scaled normal of the
same magnitude (scale_noise / grid_size) — training-from-scratch
equivalent, documented delta.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def _make_grid(in_features: int, grid_size: int, spline_order: int,
               grid_range=(-1.0, 1.0)) -> np.ndarray:
    h = (grid_range[1] - grid_range[0]) / grid_size
    pts = (np.arange(-spline_order, grid_size + spline_order + 1)
           * h + grid_range[0])
    return np.tile(pts[None, :], (in_features, 1)).astype(np.float32)


def b_splines(x: jnp.ndarray, grid: jnp.ndarray,
              spline_order: int) -> jnp.ndarray:
    """x: (N, in) → (N, in, grid_size + spline_order) basis values."""
    x = x[..., None]                               # (N, in, 1)
    g = grid[None]                                 # (1, in, G+2k+1)
    bases = ((x >= g[..., :-1]) & (x < g[..., 1:])).astype(x.dtype)
    for k in range(1, spline_order + 1):
        left = (x - g[..., :-(k + 1)]) / (g[..., k:-1] - g[..., :-(k + 1)])
        right = (g[..., k + 1:] - x) / (g[..., k + 1:] - g[..., 1:-k])
        bases = left * bases[..., :-1] + right * bases[..., 1:]
    return bases


class KANLinear(nn.Module):
    features: int
    grid_size: int = 5
    spline_order: int = 3
    scale_noise: float = 0.1
    scale_base: float = 1.0
    scale_spline: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        coeffs = self.grid_size + self.spline_order
        grid = jnp.asarray(_make_grid(in_features, self.grid_size,
                                      self.spline_order))

        base_w = self.param(
            "base_weight",
            nn.initializers.variance_scaling(
                self.scale_base ** 2 / 3.0, "fan_in", "uniform"),
            (in_features, self.features))
        spline_w = self.param(
            "spline_weight",
            nn.initializers.normal(self.scale_noise / self.grid_size),
            (in_features, coeffs, self.features))
        spline_scaler = self.param(
            "spline_scaler",
            nn.initializers.variance_scaling(
                self.scale_spline ** 2 / 3.0, "fan_in", "uniform"),
            (in_features, self.features))

        shape = x.shape
        xf = x.reshape(-1, in_features).astype(jnp.float32)
        base = nn.silu(xf) @ base_w
        basis = b_splines(xf, grid, self.spline_order)  # (N, in, coeffs)
        scaled = spline_w * spline_scaler[:, None, :]
        spline = jnp.einsum("nic,ico->no", basis, scaled,
                            preferred_element_type=jnp.float32)
        y = (base + spline).astype(x.dtype)
        return y.reshape(*shape[:-1], self.features)
