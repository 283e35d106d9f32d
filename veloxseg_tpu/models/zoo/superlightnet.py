"""SuperLightNet baseline — the reference's primary published comparison.

Reference: ``compared_model/SuperLightNet/superlightnet.py``
(``NormalU_Net``): 1×1 stem → five THPA stages (half the channels pass
through a 2-D grouped multi-axis Hadamard-product attention (GHPA, from
EGE-UNet) applied along one randomly chosen spatial axis, bidirectionally)
with InstanceNorm+stride-2-conv downsamples, and a decoder of
learnable-res-skip upsample blocks (1×1 proj → non-trainable half-pixel
trilinear ×2 → learnable per-channel skip scale → grouped 3³ conv MLP →
learnable scalar residual), final GroupNorm + channel-MLP head.

Bidirectional scan note: GHPA acts per-slice along the folded axis, so the
reference's fold→flip→GHPA→unfold→flip "reverse pass" is mathematically
the flip of the forward pass along that axis — implemented as
``y + flip(y)`` (one GHPA evaluation instead of two; identical output).
The random axis choice uses the dropout rng in train mode and axis 0 in
eval (the reference draws a fresh random axis even at eval — a
non-deterministic quirk we replace with a deterministic default).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...nn.basic import he_normal
from ...nn.norms import InstanceNorm, LayerNorm
from ...ops.resize import interp_matrix
from ..registry import register_model
from .common import Conv3d, GroupNorm


def _resize_axis_ac(p, axis, n_out):
    """align_corners=True linear resize of one axis (tiny params only)."""
    n_in = p.shape[axis]
    if n_in == n_out:
        return p
    w = interp_matrix(n_in, n_out, dtype=p.dtype)
    return jnp.moveaxis(
        jnp.tensordot(w, p, axes=((1,), (axis,)), precision="highest"),
        0, axis)


class GHPA(nn.Module):
    """Grouped multi-axis Hadamard Product Attention (2-D), channels-last.

    Input (B, H, W, C); C split in 4 groups with learned multiplicative
    maps along (H,W), (C,H), (C,W) and a depthwise path.
    """

    dim_in: int
    x_init: int
    y_init: int = 8

    @nn.compact
    def __call__(self, t):
        c4 = self.dim_in // 4
        b, hh, ww, _ = t.shape
        t = LayerNorm(name="norm1")(t)
        t1, t2, t3, t4 = jnp.split(t, 4, axis=-1)

        # xy path: params (1, x, y, c4) → resize to (H, W) → dw3x3+GELU+1x1
        pxy = self.param("params_xy", nn.initializers.ones,
                         (1, self.x_init, self.y_init, c4))
        pxy = _resize_axis_ac(_resize_axis_ac(pxy, 1, hh), 2, ww)
        m = nn.Conv(c4, (3, 3), feature_group_count=c4,
                    name="conv_xy_dw")(pxy)
        m = nn.Dense(c4, kernel_init=he_normal, name="conv_xy_pw")(
            nn.gelu(m, approximate=False))
        t1 = t1 * m

        # zx path: params (1, x, c4) → resize to H → dw conv1d over H
        pzx = self.param("params_zx", nn.initializers.ones,
                         (1, self.x_init, c4))
        pzx = _resize_axis_ac(pzx, 1, hh)
        m = nn.Conv(c4, (3,), feature_group_count=c4, name="conv_zx_dw")(
            pzx)
        m = nn.Dense(c4, kernel_init=he_normal, name="conv_zx_pw")(
            nn.gelu(m, approximate=False))
        t2 = t2 * m[:, :, None, :]          # multiply over (H, C)

        # zy path: params (1, y, c4) → resize to W → dw conv1d over W
        pzy = self.param("params_zy", nn.initializers.ones,
                         (1, self.y_init, c4))
        pzy = _resize_axis_ac(pzy, 1, ww)
        m = nn.Conv(c4, (3,), feature_group_count=c4, name="conv_zy_dw")(
            pzy)
        m = nn.Dense(c4, kernel_init=he_normal, name="conv_zy_pw")(
            nn.gelu(m, approximate=False))
        t3 = t3 * m[:, None, :, :]          # multiply over (W, C)

        # dw path: 1x1 + GELU + dw3x3
        t4 = nn.Dense(c4, kernel_init=he_normal, name="dw_pw")(t4)
        t4 = nn.Conv(c4, (3, 3), feature_group_count=c4, name="dw_dw")(
            nn.gelu(t4, approximate=False))

        y = jnp.concatenate([t1, t2, t3, t4], axis=-1)
        y = LayerNorm(name="norm2")(y)
        y = nn.Conv(self.dim_in, (3, 3), feature_group_count=self.dim_in,
                    name="ldw_dw")(y)
        y = nn.Dense(self.dim_in, kernel_init=he_normal, name="ldw_pw")(
            nn.gelu(y, approximate=False))
        return y


class THPABlock(nn.Module):
    channels: int
    expr: int = 2

    def setup(self):
        half = self.channels // 2
        self.ghpa = GHPA(half, half)
        self.norm_in = InstanceNorm()
        self.norm_out = InstanceNorm()
        self.mlp_fc1 = nn.Dense(self.channels * self.expr,
                                kernel_init=he_normal)
        self.mlp_fc2 = nn.Dense(self.channels, kernel_init=he_normal)

    def _along(self, a, axis):
        # fold `axis` into batch, run GHPA over the remaining two axes
        b = a.shape[0]
        folded = jnp.moveaxis(a, axis, 1)
        fb = folded.reshape(b * folded.shape[1], *folded.shape[2:])
        y = self.ghpa(fb)
        y = y.reshape(b, folded.shape[1], *y.shape[1:])
        y = jnp.moveaxis(y, 1, axis)
        # bidirectional: the reverse pass equals the flip along `axis`
        return y + jnp.flip(y, axis=axis)

    def __call__(self, x, train: bool):
        half = self.channels // 2
        a, res = x[..., :half], x[..., half:]
        a = self.norm_in(a)
        if train:
            rng = self.make_rng("dropout")
            direction = jax.random.randint(rng, (), 0, 3)
            # lifted switch so the shared GHPA params trace correctly
            a = nn.switch(direction,
                          [lambda m, v: m._along(v, 2),   # fold h
                           lambda m, v: m._along(v, 1),   # fold w
                           lambda m, v: m._along(v, 3)],  # fold d
                          self, a)
        else:
            a = self._along(a, 2)
        y = jnp.concatenate([a, res], axis=-1)
        y = self.norm_out(y)
        y = self.mlp_fc1(y)
        return self.mlp_fc2(nn.gelu(y, approximate=False))


class UpRepr(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, skip):
        y = nn.Dense(self.features, use_bias=False, kernel_init=he_normal,
                     name="upc")(x)
        y = jax.image.resize(
            y, (y.shape[0], *[2 * s for s in y.shape[1:4]], y.shape[-1]),
            method="trilinear")
        skip_scale = self.param("skip_scale", nn.initializers.ones,
                                (self.features,))
        y = y + skip * skip_scale
        res = y
        y = InstanceNorm()(y)
        y = Conv3d(self.features, 3, groups=max(self.features // 12, 1),
                   use_bias=False, name="mldw_conv")(y)
        y = nn.Dense(self.features, use_bias=False, kernel_init=he_normal,
                     name="mldw_pw")(nn.gelu(y, approximate=False))
        res_scale = self.param("res_scale", nn.initializers.ones, (1,))
        return y + res * res_scale


class SuperLightNet(nn.Module):
    class_nums: int = 4
    n_channels: int = 24
    expr: int = 2
    depths: Tuple[int, ...] = (1, 1, 2, 2, 2)   # "small"

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = self.n_channels
        x = nn.Dense(n, kernel_init=he_normal, name="stem")(x)

        skips = []
        for s in range(4):
            ch = n * 2 ** s
            for i in range(self.depths[s]):
                x = THPABlock(ch, self.expr, name=f"repr{s}_{i}")(x, train)
            skips.append(x)
            x = InstanceNorm()(x)
            x = Conv3d(ch * 2, 2, stride=2, padding=0,
                       name=f"down{s}")(x)
        for i in range(self.depths[4]):
            x = THPABlock(n * 16, self.expr, name=f"emb_{i}")(x, train)

        for s in reversed(range(4)):
            x = UpRepr(n * 2 ** s, name=f"up{s}")(x, skips[s])

        x = GroupNorm(num_groups=n, name="head_norm")(x)
        y = nn.Dense(n * self.expr, kernel_init=he_normal,
                     name="head_fc1")(x)
        return nn.Dense(self.class_nums, kernel_init=he_normal,
                        name="head_fc2")(nn.gelu(y, approximate=False))


@register_model("SuperLightNet")
def build_superlightnet(cfg: dict) -> SuperLightNet:
    depths_map = {"small": (1, 1, 2, 2, 2), "medium": (3, 4, 4, 4, 4),
                  "large": (3, 4, 8, 8, 8)}
    return SuperLightNet(
        class_nums=cfg.get("class_nums", 4),
        n_channels=cfg.get("n_channels", 24),
        depths=depths_map[cfg.get("depths_unidirectional", "small")],
    )
