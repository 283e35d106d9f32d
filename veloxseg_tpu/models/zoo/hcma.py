"""HCMA-UNet — hybrid CNN / Mamba / axial-attention 3-D U-Net.

Reference: ``compared_model/HCMA/HCMA.py`` (registry key ``HCMA-UNet``,
``utils/load_model.py:58-60``), used with
``{"in_channels", "n_classes", "patch_ini", "predict_mode": true}`` and
defaults depth=4, channels=(32,64,128,256,512), strides=(2,2,2,·)×3+(1,·),
DenseConv blocks, is_split=True, is_slice_attention=True, is_skip=False.

The reference depends on the ``mamba_ssm``/``causal_conv1d`` CUDA
extensions (``HCMA.py:14,28-30``) and is excluded from the reference's own
speed test (``speed_test.py:80``). Here the selective scan is TPU-native
(:func:`veloxseg_tpu.ops.selective_scan.selective_scan`,
``jax.lax.associative_scan``) and everything else is channels-last flax.

Live architecture (per the default flags):

- Encoder: DenseConv stem, then 4× Down = (AvgPool ⊕ strided ResNeXtConv)
  → TriplaneMamba3DConcat → DenseConv; each Down returns (pre-extractor,
  post-extractor) features (``HCMA.py:1147-1156``).
- TriplaneMamba splits channels (C/2, C/4, C/4) across three
  DirectionalMamba branches (axes D/H/W): per-slice VSSBlock (SS2D
  4-direction 2-D selective scan) + axial attention along the branch axis
  with a learned per-position embedding and a sigmoid-gated residual
  (``HCMA.py:919-988, 836-885, 727-834``).
- Decoder: Up = 1×1 adapt + add-skip (the *pre-extractor* encoder feature)
  + transpose-conv upsample; 1×1 Out head (``HCMA.py:1158-1221,
  1393-1425``).

Documented deltas from the reference: the reference's DenseConv "drop
path" is a one-shot lottery drawn at construction time
(``torch.rand(1) < rate and self.training`` inside ``__init__``,
``HCMA.py:1093-1095``) — a quirk, not stochastic depth; rates are ≤0.1 so
the expected configuration keeps every block. We implement the
deterministic (keep-all) behavior.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ...nn.basic import he_normal
from ...nn.norms import InstanceNorm, LayerNorm
from ...ops.pixel_shuffle import pixel_shuffle_3d
from ...ops.selective_scan import selective_scan
from ..registry import register_model
from .common import Conv3d, GroupNorm, avg_pool3d


def _lrelu(x):
    return nn.leaky_relu(x, negative_slope=0.01)


class DenseConvBlock(nn.Module):
    """DenseConv (``HCMA.py:1050-1114``): depthwise 3³+IN(affine) →
    dense-concat 1×1 expand + GELU → dense-concat 1×1 out (+residual)."""

    out_channels: int
    stride: int = 1
    expand_rate: int = 4
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = x.shape[-1]
        res = x
        x1 = Conv3d(c, 3, stride=self.stride, groups=c, name="dw")(x)
        x1 = GroupNorm(num_groups=c, name="norm")(x1)  # IN w/ affine
        x1 = nn.Dropout(self.dropout_rate)(x1, deterministic=deterministic)
        x2 = nn.Dense(c * self.expand_rate, kernel_init=he_normal,
                      name="expand")(jnp.concatenate([x, x1], axis=-1))
        x2 = nn.gelu(x2, approximate=False)
        x2 = nn.Dropout(self.dropout_rate * 2)(x2,
                                               deterministic=deterministic)
        out = nn.Dense(self.out_channels, kernel_init=he_normal,
                       name="out")(jnp.concatenate([x, x1, x2], axis=-1))
        if c == self.out_channels:
            out = out + res
        return out


class ResNeXtConv(nn.Module):
    """ResNeXtConv (``HCMA.py:990-1047``): 1×1 expand → grouped 3³ (groups
    = in_channels) → 1×1 project, IN(affine)+LeakyReLU after each.

    ``residual=False`` reproduces a reference quirk: ``Down`` passes its
    stride as a TUPLE, so the reference's ``self.stride == 1`` residual
    guard (``HCMA.py:1046``) is False even for stride (1,1,1) — the
    downsample ResNeXt never adds its residual."""

    out_channels: int
    stride: int = 1
    expand_rate: int = 2
    residual: bool = True

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        res = x
        y = nn.Dense(c * self.expand_rate, kernel_init=he_normal,
                     name="pw1")(x)
        y = _lrelu(GroupNorm(num_groups=y.shape[-1], name="n1")(y))
        y = Conv3d(c * self.expand_rate, 3, stride=self.stride, groups=c,
                   name="dw")(y)
        y = _lrelu(GroupNorm(num_groups=y.shape[-1], name="n2")(y))
        y = nn.Dense(self.out_channels, kernel_init=he_normal, name="pw2")(y)
        y = _lrelu(GroupNorm(num_groups=self.out_channels, name="n3")(y))
        if self.residual and c == self.out_channels and self.stride == 1:
            y = y + res
        return y


def _uniform_sym(a: float):
    """U[-a, a] init (torch Linear-style)."""
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -a, a)
    return init


def _dt_bias_init(key, shape, dtype=jnp.float32,
                  dt_min=0.001, dt_max=0.1, floor=1e-4):
    """Inverse-softplus of log-uniform dt (``HCMA.py:295-303``)."""
    u = jax.random.uniform(key, shape, dtype)
    dt = jnp.exp(u * (math.log(dt_max) - math.log(dt_min))
                 + math.log(dt_min))
    dt = jnp.clip(dt, floor, None)
    return dt + jnp.log(-jnp.expm1(-dt))


class SS2D(nn.Module):
    """2-D 4-direction selective-scan block (``HCMA.py:209-500``,
    ``forward_corev0`` path). Channels-last (N, H, W, C)."""

    d_model: int
    d_state: int = 16
    d_conv: int = 3
    expand: float = 0.5
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        d_inner = int(self.expand * self.d_model)
        dt_rank = math.ceil(self.d_model / 16)
        n = self.d_state
        K = 4

        xz = nn.Dense(d_inner * 2, use_bias=False, kernel_init=he_normal,
                      name="in_proj")(x)
        xs, z = jnp.split(xz, 2, axis=-1)

        # Depthwise 2-D conv (``conv2d``, groups=d_inner) + SiLU.
        kern = self.param("conv2d_kernel", he_normal,
                          (self.d_conv, self.d_conv, 1, d_inner))
        bias = self.param("conv2d_bias", nn.initializers.zeros, (d_inner,))
        pad = (self.d_conv - 1) // 2
        xs = lax.conv_general_dilated(
            xs, kern.astype(xs.dtype), window_strides=(1, 1),
            padding=[(pad, pad)] * 2, feature_group_count=d_inner,
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
        xs = nn.silu(xs)

        b, h, w, _ = xs.shape
        L = h * w

        # Four scan directions: row-major, column-major, and their flips
        # (``forward_corev0``, ``HCMA.py:352-355``).
        d0 = xs.reshape(b, L, d_inner)
        d1 = xs.transpose(0, 2, 1, 3).reshape(b, L, d_inner)
        dirs = jnp.stack(
            [d0, d1, jnp.flip(d0, axis=1), jnp.flip(d1, axis=1)], axis=0)

        # Parameter shapes mirror the reference exactly (K-stacked).
        x_proj_w = self.param(
            "x_proj_weight", _uniform_sym(1 / math.sqrt(d_inner)),
            (K, dt_rank + 2 * n, d_inner))
        dt_w = self.param(
            "dt_projs_weight", _uniform_sym(dt_rank ** -0.5),
            (K, d_inner, dt_rank))
        dt_b = self.param("dt_projs_bias", _dt_bias_init, (K, d_inner))
        a_log = self.param(
            "A_logs",
            lambda key, shape: jnp.tile(
                jnp.log(jnp.arange(1, n + 1, dtype=jnp.float32)),
                (shape[0], 1)),
            (K * d_inner, n))
        d_skip = self.param("Ds", nn.initializers.ones, (K * d_inner,))

        x_dbl = jnp.einsum("knld,kcd->knlc", dirs, x_proj_w)
        dts, Bs, Cs = jnp.split(x_dbl, [dt_rank, dt_rank + n], axis=-1)
        dts = jnp.einsum("knlr,kdr->knld", dts, dt_w)

        A = -jnp.exp(a_log.astype(jnp.float32)).reshape(K, d_inner, n)
        Dk = d_skip.reshape(K, d_inner)

        y = jax.vmap(selective_scan)(dirs, dts, A, Bs, Cs, Dk, dt_b)

        def t_back(v):  # column-major sequence -> row-major
            return v.reshape(b, w, h, d_inner).transpose(0, 2, 1, 3) \
                    .reshape(b, L, d_inner)

        out = (y[0] + jnp.flip(y[2], axis=1) + t_back(y[1])
               + t_back(jnp.flip(y[3], axis=1)))
        # reference out_norm is a default nn.LayerNorm -> eps 1e-5
        out = LayerNorm(eps=1e-5, name="out_norm")(out.reshape(b, h, w, d_inner))
        out = out * nn.silu(z)
        out = nn.Dense(self.d_model, use_bias=False, kernel_init=he_normal,
                       name="out_proj")(out)
        if self.dropout > 0:
            out = nn.Dropout(self.dropout)(out,
                                           deterministic=deterministic)
        return out


class VSSBlock(nn.Module):
    """Down-project → LN → SS2D (+residual) → up-project (+residual)
    (``HCMA.py:502-527``)."""

    hidden_dim: int
    d_state: int = 16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        d_model = self.hidden_dim // 2
        h = nn.Dense(d_model, kernel_init=he_normal, name="down")(x)
        h = h + SS2D(d_model=d_model, d_state=self.d_state,
                     name="ss2d")(LayerNorm(name="ln_1")(h), deterministic)
        return nn.Dense(self.hidden_dim, kernel_init=he_normal,
                        name="up")(h) + x


class AxialAttention3D(nn.Module):
    """Single-head attention along one spatial axis with learned
    per-position embedding and sigmoid-gated residual
    (``HCMA.py:727-834``). ``axis`` ∈ {1, 2, 3} of (B, D, H, W, C)."""

    axis: int
    axis_len: int

    @nn.compact
    def __call__(self, x, processed):
        c = x.shape[-1]
        pos = self.param("pos_embed", nn.initializers.xavier_uniform(),
                         (self.axis_len, c))
        q = nn.Dense(c, kernel_init=he_normal, name="q")(processed)
        k = nn.Dense(c, kernel_init=he_normal, name="k")(processed)
        v = nn.Dense(c, kernel_init=he_normal, name="v")(processed)
        shape = [1, 1, 1, 1, c]
        shape[self.axis] = self.axis_len
        q = q + pos.reshape(shape)
        k = k + pos.reshape(shape)

        # Move the attention axis next-to-last; batch everything else.
        qm = jnp.moveaxis(q, self.axis, -2)
        km = jnp.moveaxis(k, self.axis, -2)
        vm = jnp.moveaxis(v, self.axis, -2)
        scores = jnp.einsum("...lc,...mc->...lm", qm, km,
                            preferred_element_type=jnp.float32)
        scores = scores / math.sqrt(c)
        wts = nn.softmax(scores, axis=-1)
        out = jnp.einsum("...lm,...mc->...lc", wts.astype(vm.dtype), vm)
        out = jnp.moveaxis(out, -2, self.axis)

        gamma = nn.sigmoid(self.param("gamma", nn.initializers.zeros, ()))
        return gamma * out + (1.0 - gamma) * x


class DirectionalMamba(nn.Module):
    """Per-slice VSSBlock along one axis + axial slice attention
    (``HCMA.py:836-885``). ``axis`` ∈ {1, 2, 3}."""

    axis: int
    axis_len: int
    d_state: int = 32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b = x.shape[0]
        c = x.shape[-1]
        # (B, D, H, W, C) -> (B·L, h, w, C) slices perpendicular to axis.
        perm = {1: (0, 1, 2, 3, 4), 2: (0, 2, 1, 3, 4),
                3: (0, 3, 1, 2, 4)}[self.axis]
        xp = x.transpose(perm)
        lead = xp.shape[:2]
        slices = xp.reshape(b * xp.shape[1], *xp.shape[2:])
        processed = VSSBlock(hidden_dim=c, d_state=self.d_state,
                             name="vssb")(slices, deterministic)
        processed = processed.reshape(*lead, *processed.shape[1:])
        inv = np.argsort(perm)
        processed = processed.transpose(tuple(inv))
        return AxialAttention3D(axis=self.axis, axis_len=self.axis_len,
                                name="slice_attn")(x, processed)


class TriplaneMamba(nn.Module):
    """Channel-split (C/2, C/4, C/4) triplane Mamba + fusion + residual
    (``TriplaneMamba3DConcat``, ``HCMA.py:919-988``, is_split=True)."""

    feature_size: Tuple[int, int, int]
    d_state: int = 32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = x.shape[-1]
        q = c // 4
        parts = [x[..., :2 * q], x[..., 2 * q:3 * q], x[..., 3 * q:]]
        outs = [
            DirectionalMamba(axis=ax, axis_len=self.feature_size[ax - 1],
                             d_state=self.d_state,
                             name=f"mamba_{'xyz'[ax - 1]}")(p, deterministic)
            for ax, p in zip((1, 2, 3), parts)
        ]
        y = jnp.concatenate(outs, axis=-1)
        y = nn.Dense(c, kernel_init=he_normal, name="fusion")(y)
        y = InstanceNorm()(_lrelu(y))
        return y + x


class Down(nn.Module):
    """(AvgPool ⊕ strided ResNeXt) → TriplaneMamba → DenseConv; returns
    (pre-extractor, post-extractor) (``HCMA.py:1115-1156``)."""

    out_channels: int
    stride: int
    feature_size: Tuple[int, int, int]
    num_conv: int = 1
    expand_rate: int = 4
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = x.shape[-1]
        x = avg_pool3d(x, self.stride) + \
            ResNeXtConv(c, stride=self.stride, residual=False,
                        name="down_resnext")(x)
        x = TriplaneMamba(feature_size=self.feature_size,
                          name="tmamba")(x, deterministic)
        x_down = x
        for i in range(self.num_conv):
            x = DenseConvBlock(self.out_channels,
                               expand_rate=self.expand_rate,
                               dropout_rate=self.dropout_rate,
                               name=f"extract_{i}")(x, deterministic)
        return x_down, x


class Up(nn.Module):
    """1×1 adapt x_low → add skip → transpose-conv upsample
    (``HCMA.py:1158-1207``, fusion_mode='add', kernel==stride)."""

    high_channels: int
    stride: int

    @nn.compact
    def __call__(self, x_low, x_high):
        y = nn.Dense(self.high_channels, kernel_init=he_normal,
                     name="adapt")(x_low)
        y = _lrelu(GroupNorm(num_groups=self.high_channels, name="n")(y))
        y = y + x_high
        s = self.stride
        y = nn.Dense(self.high_channels * s ** 3, kernel_init=he_normal,
                     name="up")(y)
        if s > 1:
            y = pixel_shuffle_3d(y, s)
        return y


class HCMA(nn.Module):
    """Top-level HCMA-UNet (``HCMA.py:1299-1425``, default flags)."""

    in_channels: int
    n_classes: int
    patch_ini: Tuple[int, int, int] = (128, 128, 128)
    channels: Tuple[int, ...] = (32, 64, 128, 256, 512)
    strides: Tuple[int, ...] = (2, 2, 2, 1)
    encoder_expand_rate: Tuple[int, ...] = (4, 4, 4, 4)
    dropout_rate_list: Tuple[float, ...] = (0.025, 0.05, 0.1, 0.1)
    deep_supervision: bool = False
    predict_mode: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        deterministic = not train
        depth = len(self.strides)
        sizes = [tuple(self.patch_ini)]
        for s in self.strides:
            sizes.append(tuple(d // s for d in sizes[-1]))

        feats = []  # per level: (pre-extractor x_down, post-extractor x)
        h = DenseConvBlock(self.channels[0], name="stem")(x, deterministic)
        feats.append((None, h))
        for i in range(depth):
            x_down, h = Down(
                out_channels=self.channels[i + 1],
                stride=self.strides[i],
                feature_size=sizes[i + 1],
                expand_rate=self.encoder_expand_rate[i],
                dropout_rate=self.dropout_rate_list[i],
                name=f"down_{i}")(h, deterministic)
            feats.append((x_down, h))

        # Decode (``HCMA.py:1401-1418``): at step i the skip is the
        # *pre-extractor* feature of encoder level depth-i+1.
        dec_feats = []
        x_dec = feats[depth][1]
        x_skip = feats[depth][0]
        for i in range(depth):
            x_dec = Up(high_channels=self.channels[depth - i - 1],
                       stride=self.strides[depth - i - 1],
                       name=f"up_{i}")(x_dec, x_skip)
            dec_feats.append(x_dec)
            if i < depth - 1:
                x_skip = feats[depth - i - 1][0]

        def head(i, feat):
            y = nn.Dropout(0.1)(feat, deterministic=deterministic)
            return nn.Dense(self.n_classes, kernel_init=he_normal,
                            name=f"out_{i}")(y)

        if self.deep_supervision and train:
            return [head(i, f) for i, f in enumerate(dec_feats)][::-1]
        return head(depth - 1, dec_feats[-1])


@register_model("HCMA-UNet")
def build_hcma(cfg: dict) -> HCMA:
    return HCMA(
        in_channels=int(cfg["in_channels"]),
        n_classes=int(cfg["n_classes"]),
        patch_ini=tuple(cfg.get("patch_ini", (128, 128, 128))),
        deep_supervision=bool(cfg.get("deep_supervision", False)),
        predict_mode=bool(cfg.get("predict_mode", True)),
    )
