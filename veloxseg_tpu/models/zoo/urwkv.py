"""U-RWKV baseline — the reference's native-CUDA model
(``compared_model/URWKV/URWKV.py``), running on the TPU-native WKV kernel
(:mod:`veloxseg_tpu.ops.wkv`).

Architecture (``v_enc_256_fffse_dec_fusion_rwkv_with2x4_3d``): conv stem →
4 shallow MultiSE stages + 1 deep (split-SE) stage with maxpool downsamples
→ an RWKV bottleneck block that runs the WKV recurrence over six
directional flattenings of the volume (W/H/D forward+reversed, shared
weights, averaged) → nearest-upsample+conv decoder with concat skips.

Preserved reference quirks (documented):
- ``q_shift`` ignores its shifting arguments and performs a reshape
  "scramble": (B, N, C) memory reinterpreted as (B, C, D, H, W) and
  re-flattened — a fixed permutation, not a spatial shift
  (``URWKV.py:33-42``).
- ``LoRABlock_f_plus_rev``'s "reverse" tensor is an identity
  transformation of its input (permute→reshape→transpose→view round-trip),
  so the block equals ``2·forward(x)`` (``URWKV.py:452-469``).
- WKV is called with ``w = spatial_decay/T`` (Vision-RWKV style, decay not
  negated/exponentiated) and ``u = spatial_first/T``.
- BatchNorm realized as batch-statistics norm (no running stats).
"""

from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ...nn.basic import he_normal
from ...nn.norms import LayerNorm
from ...ops.wkv import wkv
from ..registry import register_model
from .common import BatchNormNoTrack, Conv3d, max_pool3d


# --- directional scans: (B, D, H, W, C) -> (B, N, C) and inverse ---------

def _scan(x, axis_order, flip_axis=None):
    if flip_axis is not None:
        x = jnp.flip(x, axis=flip_axis)
    x = jnp.transpose(x, (0,) + axis_order + (4,))
    b = x.shape[0]
    return x.reshape(b, -1, x.shape[-1])


def _scan_inv(seq, spatial, axis_order, flip_axis=None):
    b, _, c = seq.shape
    dims = tuple(spatial[i - 1] for i in axis_order)
    x = seq.reshape(b, *dims, c)
    inv = [0] * 3
    for pos, ax in enumerate(axis_order):
        inv[ax - 1] = pos + 1
    x = jnp.transpose(x, (0,) + tuple(inv) + (4,))
    if flip_axis is not None:
        x = jnp.flip(x, axis=flip_axis)
    return x


_SCAN_SPECS = [
    ((1, 2, 3), None),   # left_to_right  (W fastest)
    ((1, 2, 3), 3),      # right_to_left  (W flipped)
    ((1, 3, 2), None),   # up_to_down     (H fastest)
    ((1, 3, 2), 2),      # down_to_up     (H flipped)
    ((2, 3, 1), None),   # front_to_back  (D fastest)
    ((2, 3, 1), 1),      # back_to_front  (D flipped)
]


def _q_shift_scramble(x_seq, spatial):
    """Reference q_shift: (B,N,C) memory-reinterpreted as (B,C,D,H,W) then
    re-flattened channel-last — a fixed deterministic permutation."""
    b, n, c = x_seq.shape
    d, h, w = spatial
    y = x_seq.reshape(b, c, d, h, w)
    return y.transpose(0, 2, 3, 4, 1).reshape(b, n, c)


def _fancy_init(c, layer_id=0, n_layer=8):
    r01 = layer_id / (n_layer - 1)
    r10 = 1.0 - layer_id / n_layer
    decay = np.array([-5 + 8 * (h / (c - 1)) ** (0.7 + 1.3 * r01)
                      for h in range(c)], np.float32)
    zigzag = np.array([((i + 1) % 3 - 1) * 0.5 for i in range(c)],
                      np.float32)
    first = np.full(c, math.log(0.3), np.float32) + zigzag
    ramp = np.arange(c, dtype=np.float32) / c
    mix_k = ramp ** r10
    mix_v = ramp ** r10 + 0.3 * r01
    mix_r = ramp ** (0.5 * r10)
    return decay, first, mix_k, mix_v, mix_r


class SpatialInteractionMix(nn.Module):
    """RWKV spatial mixing over one scan sequence (shared across scans)."""

    n_embd: int
    layer_id: int = 0
    n_layer: int = 8
    key_norm: bool = True

    @nn.compact
    def __call__(self, x_seq, spatial):
        c = self.n_embd
        decay0, first0, mk0, mv0, mr0 = _fancy_init(c, self.layer_id,
                                                    self.n_layer)
        decay = self.param("spatial_decay", lambda k: jnp.asarray(decay0))
        first = self.param("spatial_first", lambda k: jnp.asarray(first0))
        mix_k = self.param("spatial_mix_k", lambda k: jnp.asarray(mk0))
        mix_v = self.param("spatial_mix_v", lambda k: jnp.asarray(mv0))
        mix_r = self.param("spatial_mix_r", lambda k: jnp.asarray(mr0))

        xx = _q_shift_scramble(x_seq, spatial)
        xk = x_seq * mix_k + xx * (1 - mix_k)
        xv = x_seq * mix_v + xx * (1 - mix_v)
        xr = x_seq * mix_r + xx * (1 - mix_r)

        k = nn.Dense(c, use_bias=False, kernel_init=he_normal,
                     name="key")(xk)
        v = nn.Dense(c, use_bias=False, kernel_init=he_normal,
                     name="value")(xv)
        r = nn.Dense(c, use_bias=False, kernel_init=he_normal,
                     name="receptance")(xr)
        t = x_seq.shape[1]
        y = wkv(decay / t, first / t, k, v)
        if self.key_norm:
            y = LayerNorm(name="key_norm")(y)
        y = nn.sigmoid(r) * y
        return nn.Dense(c, use_bias=False, kernel_init=he_normal,
                        name="output")(y)


class SpectralMixer(nn.Module):
    n_embd: int
    layer_id: int = 0
    n_layer: int = 8
    hidden_rate: int = 4
    key_norm: bool = True

    @nn.compact
    def __call__(self, x_seq, spatial):
        c = self.n_embd
        _, _, mk0, _, mr0 = _fancy_init(c, self.layer_id, self.n_layer)
        mix_k = self.param("spatial_mix_k", lambda k: jnp.asarray(mk0))
        mix_r = self.param("spatial_mix_r", lambda k: jnp.asarray(mr0))
        xx = _q_shift_scramble(x_seq, spatial)
        xk = x_seq * mix_k + xx * (1 - mix_k)
        xr = x_seq * mix_r + xx * (1 - mix_r)
        k = nn.Dense(c * self.hidden_rate, use_bias=False,
                     kernel_init=he_normal, name="key")(xk)
        k = jnp.square(nn.relu(k))
        if self.key_norm:
            k = LayerNorm(name="key_norm")(k)
        kv = nn.Dense(c, use_bias=False, kernel_init=he_normal,
                      name="value")(k)
        r = nn.Dense(c, use_bias=False, kernel_init=he_normal,
                     name="receptance")(xr)
        return nn.sigmoid(r) * kv


class LoRABlock(nn.Module):
    """Six-directional RWKV block + spectral FFN (``LoRABlock``)."""

    n_embd: int
    key_norm: bool = True

    @nn.compact
    def __call__(self, x):
        b, d, h, w, c = x.shape
        spatial = (d, h, w)
        mixer = SpatialInteractionMix(self.n_embd, key_norm=self.key_norm,
                                      name="spa_mix")
        ln1 = LayerNorm(name="ln1")
        gamma1 = self.param("gamma1", nn.initializers.ones, (c,))

        outs = []
        for order, flip in _SCAN_SPECS:
            seq = _scan(x, order, flip)
            seq = seq + gamma1 * mixer(ln1(seq), spatial)
            outs.append(_scan_inv(seq, spatial, order, flip))
        y = sum(outs) / len(outs)

        seq = y.reshape(b, d * h * w, c)
        gamma2 = self.param("gamma2", nn.initializers.ones, (c,))
        ffn = SpectralMixer(self.n_embd, key_norm=self.key_norm,
                            name="ffn")
        seq = seq + gamma2 * ffn(LayerNorm(name="ln2")(seq), spatial)
        return seq.reshape(b, d, h, w, c)


class ConvBnAct(nn.Module):
    features: int
    kernel: int = 1
    act: bool = False

    @nn.compact
    def __call__(self, x):
        y = Conv3d(self.features, self.kernel, name="conv")(x)
        y = BatchNormNoTrack(name="bn")(y)
        return nn.gelu(y, approximate=False) if self.act else y


class MultiSEShallow(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        res = x
        y = Conv3d(c, 3, groups=c, name="dwconv")(x)
        y = nn.gelu(y, approximate=False)
        y = BatchNormNoTrack(name="bn")(y)
        y = res + y
        y = ConvBnAct(c * 4, 1, act=True, name="pw_in4")(y)
        y = ConvBnAct(self.features, 1, act=True, name="pw_out")(y)
        if c == self.features:
            y = res + y
        return y, max_pool3d(y, 2)


class MultiSEDeep(nn.Module):
    features: int
    reduction: int = 8
    split: int = 2

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        red = self.features // self.reduction
        part = red // self.split
        y = ConvBnAct(red, 1, name="pw1")(x)
        parts = [y[..., 0::2], y[..., 1::2]]
        for i in range(self.reduction - 1):
            nxt = Conv3d(part, 3, groups=part, name=f"dw_{i}")(parts[-1])
            parts.append(nxt)
        parts[0] = parts[0] + parts[1]
        parts.pop(1)
        y = jnp.concatenate(parts, axis=-1)
        y = ConvBnAct(self.features, 1, name="pw2")(y)
        if c == self.features:
            y = x + y
        return y, max_pool3d(y, 2)


class UpsampleConv(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        b, d, h, w, c = x.shape
        y = jnp.repeat(jnp.repeat(jnp.repeat(x, 2, 1), 2, 2), 2, 3)
        y = Conv3d(self.features, 3, name="conv")(y)
        y = BatchNormNoTrack(name="bn")(y)
        return nn.gelu(y, approximate=False)


class ChannelFusionConv(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = Conv3d(c, 3, groups=2, name="conv1")(x)
        y = BatchNormNoTrack(name="bn1")(nn.gelu(y, approximate=False))
        y = Conv3d(self.features * 4, 1, padding=0, name="conv2")(y)
        y = BatchNormNoTrack(name="bn2")(nn.gelu(y, approximate=False))
        y = Conv3d(self.features, 1, padding=0, name="conv3")(y)
        return BatchNormNoTrack(name="bn3")(nn.gelu(y, approximate=False))


class URWKV(nn.Module):
    num_classes: int = 2
    dims: Tuple[int, ...] = (8, 16, 64, 80, 128)

    @nn.compact
    def __call__(self, x, train: bool = False):
        dims = self.dims
        p1 = nn.gelu(BatchNormNoTrack(name="stem_bn")(
            Conv3d(dims[0], 3, name="stem_conv")(x)), approximate=False)
        x1, p2 = MultiSEShallow(dims[0], name="e1")(p1)
        x2, p3 = MultiSEShallow(dims[1], name="e2")(p2)
        x3, p4 = MultiSEShallow(dims[2], name="e3")(p3)
        x4, p5 = MultiSEShallow(dims[3], name="e4")(p4)
        x5, _ = MultiSEDeep(dims[4], name="e5")(p5)
        # LoRABlock_f_plus_rev: the reference "reverse" input is an identity
        # round-trip, so the block is exactly 2·forward(x).
        x5 = 2.0 * LoRABlock(dims[4], name="bx4rwkv")(x5)

        d5 = UpsampleConv(dims[3], name="up5")(x5)
        d5 = ChannelFusionConv(dims[3], name="upc5")(
            jnp.concatenate([x4, d5], axis=-1))
        d4 = UpsampleConv(dims[2], name="up4")(d5)
        d4 = ChannelFusionConv(dims[2], name="upc4")(
            jnp.concatenate([x3, d4], axis=-1))
        d3 = UpsampleConv(dims[1], name="up3")(d4)
        d3 = ChannelFusionConv(dims[1], name="upc3")(
            jnp.concatenate([x2, d3], axis=-1))
        d2 = UpsampleConv(dims[0], name="up2")(d3)
        d2 = ChannelFusionConv(dims[0], name="upc2")(
            jnp.concatenate([x1, d2], axis=-1))
        return nn.Dense(self.num_classes, kernel_init=he_normal,
                        name="head")(d2)


@register_model("U-RWKV")
def build_urwkv(cfg: dict) -> URWKV:
    return URWKV(num_classes=cfg.get("num_classes", 2))
