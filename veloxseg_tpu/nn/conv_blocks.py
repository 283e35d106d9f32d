"""JLC (Johnson-Lindenstrauss-guided Convolution) blocks and up/down sampling.

Reference semantics (``model/components/conv_blocks.py``):

- ``DownConv``: conv(kernel 2p−1, stride p, pad p−1) + InstanceNorm.
- ``UpConv``: ConvTranspose(kernel 2, stride 2) + InstanceNorm. With
  kernel == stride the transpose conv writes one independent 2×2×2 block
  per input voxel, which is exactly a 1×1 projection to ``out·8`` channels
  followed by a 3-D pixel shuffle — a single MXU matmul instead of a
  scatter-style transposed convolution. We implement it that way.
- ``JLC``: residual sum of parallel grouped convs (k ∈ kernel_sizes, each
  +IN+act), then a residual 1×1 channel-MLP (IN → expand → act → project →
  dropout). Group count is the JL knob (channels / min_dim_group).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops import fused_jlc, packed_conv
from ..ops.pixel_shuffle import pixel_shuffle_3d
from .basic import DenseParams, GroupedConv3d, get_act, he_normal
from .norms import InstanceNorm


class _ConvParams(nn.Module):
    """Parameter-only stand-in for :class:`GroupedConv3d` — creates the
    identical ``kernel``/``bias`` params (same shapes, names, init) without
    running the convolution, so the packed JLC path below shares one
    checkpoint/optimizer pytree with the unpacked path."""

    features: int
    kernel_size: Tuple[int, int, int]
    groups: int = 1

    @nn.compact
    def __call__(self, in_ch: int):
        kernel = self.param(
            "kernel", he_normal,
            (*self.kernel_size, in_ch // self.groups, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


_DenseParams = DenseParams


class _UpConvParams(nn.Module):
    """UpConv params: Dense-shaped kernel + TIED (C,) bias (reference
    ConvTranspose parameterization — see UpConv)."""

    features: int
    in_features: int
    shuffle: int = 8

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", he_normal,
                            (self.in_features, self.features * self.shuffle))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class DownConv(nn.Module):
    """Strided overlapping patch downsample + InstanceNorm.

    ``packed_out=True`` emits the 2×2×2 space-to-depth stream directly
    (one conv with parity-shifted weights, see
    ``ops/packed_conv.packed_out_kernel``) — N jumps from ``features`` to
    ``8·features`` on the MXU and the downstream packed JLC needs no
    separate pack transpose. Same params, same math.
    """

    features: int
    patch_size: int = 2
    groups: int = 1
    use_norm: bool = True
    packed_out: bool = False
    out_groups: int = 1   # group-major layout of the emitted packed stream

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.patch_size
        k = 2 * p - 1
        if self.packed_out:
            if any(s % (2 * p) for s in x.shape[1:4]):
                raise ValueError(
                    f"packed_out DownConv needs dims divisible by "
                    f"{2 * p}, got {x.shape[1:4]}")
            kern, bias = _ConvParams(
                features=self.features, kernel_size=(k, k, k),
                groups=self.groups, name="GroupedConv3d_0")(x.shape[-1])
            wp = packed_conv.packed_out_kernel(
                kern.astype(x.dtype), x.shape[-1], self.groups, p,
                out_groups=self.out_groups)
            y = packed_conv.conv_strided_packed_out(x, wp, p)
            y = y + packed_conv.tile_bias(bias,
                                          self.out_groups).astype(y.dtype)
            if self.use_norm:
                y = packed_conv.instance_norm_packed(y, self.features,
                                                     self.out_groups)
            return y
        y = GroupedConv3d(
            features=self.features,
            kernel_size=(k, k, k),
            strides=(p, p, p),
            padding=[(p - 1, p - 1)] * 3,
            groups=self.groups,
        )(x)
        if self.use_norm:
            y = InstanceNorm()(y)
        return y


class UpConv(nn.Module):
    """2× upsample: 1×1 conv to features·8 + pixel shuffle + InstanceNorm.

    Mathematically identical to ConvTranspose(kernel=2, stride=2) — same
    parameter count, MXU-friendly layout.
    """

    features: int
    up_rate: int = 2
    packed_in: bool = False
    packed_out: bool = False
    out_groups: int = 1   # group-major layout of the emitted packed stream

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        r = self.up_rate
        in_feat = x.shape[-1] // 8 if self.packed_in else x.shape[-1]
        # Kernel (C_in, C·r³) like a Dense, bias (C,) TIED per logical
        # channel exactly like the reference ConvTranspose bias (an
        # untied (C·8,) bias would drift from the reference under
        # training — each copy would get its own AdamW update).
        kern, bias = _UpConvParams(self.features, in_feat, r ** 3,
                                   name="Dense_0")()
        if self.packed_in and packed_conv.enabled() and r == 2:
            # packed → packed ×2 upsample: the input's packed grid IS the
            # output's packed grid density halfway — each input voxel
            # (q, r) produces the 8 parity slots of output packed block
            # u = 2q + r, so the whole op is a per-parity Dense (with the
            # pixel-shuffle column permutation) followed by one
            # block-granular transpose (minor dim stays 8·C — no lane
            # padding anywhere).
            from . import pwa_packed
            g = self.out_groups
            kern2 = kern.reshape(in_feat, g, self.features // g, 8)
            kern2 = kern2.transpose(0, 1, 3, 2).reshape(
                in_feat, 8 * self.features)
            big = pwa_packed.dense_parity(kern2)
            y = x @ big.astype(x.dtype)
            y = packed_conv.unpack_s2d(y, 8 * self.features)
            y = y + packed_conv.tile_bias(bias, g).astype(y.dtype)
            y = packed_conv.instance_norm_packed(y, self.features, g)
            if self.packed_out:
                return y
            return packed_conv.unpack_s2d(y, self.features, g)
        if self.packed_out and packed_conv.enabled() and r == 2:
            # ×2 upsample of grid S produces a stream whose PACKED grid is
            # S itself — so with the Dense columns permuted from the
            # pixel-shuffle (c, r³) order to the packed group-major
            # (g, r³, cg) order, the projection output IS the packed
            # stream: no spatial op at all.
            g = self.out_groups
            kern = kern.reshape(x.shape[-1], g, self.features // g, 8)
            kern = kern.transpose(0, 1, 3, 2).reshape(x.shape[-1],
                                                      8 * self.features)
            y = x @ kern.astype(x.dtype)
            y = y + packed_conv.tile_bias(bias, g).astype(y.dtype)
            return packed_conv.instance_norm_packed(y, self.features, g)
        y = x @ kern.astype(x.dtype)
        y = pixel_shuffle_3d(y, r)
        y = y + bias.astype(y.dtype)
        return InstanceNorm()(y)


class JLC(nn.Module):
    """One JLC block (multi-kernel grouped spatial mix + channel MLP)."""

    kernel_sizes: Tuple[int, ...] = (1, 3, 5)
    groups: int = 1
    expansion_factor: int = 4
    activation: str = "gelu"
    dropout: float = 0.0
    packed_io: bool = False   # input/output are already packed streams

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        act = get_act(self.activation)
        multi = len(self.kernel_sizes) > 1

        if self.packed_io:
            return self._packed(x, deterministic, act, multi,
                                packed_io=True)
        if (packed_conv.packable(x.shape[1:4])
                and max(self.kernel_sizes) <= 5
                and all(k % 2 == 1 for k in self.kernel_sizes)):
            return self._packed(x, deterministic, act, multi)
        c = x.shape[-1]

        branches = []
        for k in self.kernel_sizes:
            y = GroupedConv3d(
                features=c, kernel_size=(k, k, k),
                padding=[(k // 2, k // 2)] * 3, groups=self.groups)(x)
            if multi:
                y = act(InstanceNorm()(y))
            branches.append(y)
        out = x + sum(branches)

        # Residual channel MLP: IN → expand → act → project → dropout.
        z = InstanceNorm()(out)
        z = nn.Dense(c * self.expansion_factor, kernel_init=he_normal)(z)
        z = act(z)
        z = nn.Dense(c, kernel_init=he_normal)(z)
        z = nn.Dropout(self.dropout)(z, deterministic=deterministic)
        return out + z

    def _packed(self, x, deterministic, act, multi, packed_io=False):
        """Space-to-depth execution (see ``ops/packed_conv.py``): the
        whole block — all kernel-size branches in ONE dense conv, both
        InstanceNorms, the channel MLP — runs on the 2×-packed grid with
        every materialized tensor keeping the full 8·C minor dim (narrow
        views lane-pad ~8× on TPU). Mathematically identical to the
        unpacked path (same params). ``packed_io=True`` means the caller
        already holds the packed stream (no pack/unpack here)."""
        c = x.shape[-1] // 8 if packed_io else x.shape[-1]
        nb = len(self.kernel_sizes)
        weights, biases = [], []
        for i, k in enumerate(self.kernel_sizes):
            kern, bias = _ConvParams(
                features=c, kernel_size=(k, k, k), groups=self.groups,
                name=f"GroupedConv3d_{i}")(c)
            weights.append((k, kern.astype(x.dtype)))
            biases.append(bias)
        xp = x if packed_io else packed_conv.pack_s2d(x)
        grouped = packed_conv.grouped_preferred(xp.shape, c, self.groups)

        # Fused Pallas execution of the whole block (L0/L1 flagship
        # shapes): conv+IN+GELU+residual and IN+MLP+residual each run as
        # one kernel with VMEM-resident intermediates (ops/fused_jlc.py).
        if (multi and not grouped and self.activation == "gelu"
                and (deterministic or self.dropout == 0.0)):
            use_fused, interp = fused_jlc.usable(
                xp.shape, c, nb, self.expansion_factor)
            if use_fused:
                k1, b1 = _DenseParams(c * self.expansion_factor,
                                      in_features=c, name="Dense_0")()
                k2, b2 = _DenseParams(c, in_features=c
                                      * self.expansion_factor,
                                      name="Dense_1")()
                out = fused_jlc.jlc_block(xp, weights, self.groups,
                                          k1, b1, k2, b2,
                                          interpret=interp)
                return out if packed_io else packed_conv.unpack_s2d(out, c)

        if grouped:
            # deep levels: group-batched matmul — no G× zero-block dense
            # kernel (42/170 MB at L2/L3) and G× fewer FLOPs
            wg = packed_conv.packed_group_weights(weights, c, self.groups)
            y = packed_conv.conv_packed_grouped(xp, wg, c, self.groups)
        else:
            wp = packed_conv.packed_kernel(weights, c, self.groups)
            y = packed_conv.conv_packed(xp, wp)  # (…, nb·8·c) branch-major
        y = y + packed_conv.branch_bias(biases, 1).astype(y.dtype)
        if multi:
            # per-branch IN (per logical channel over spatial+parity) + act
            y = act(packed_conv.instance_norm_packed(y, c, 1, nb))
        out = xp + sum(y[..., i * 8 * c:(i + 1) * 8 * c]
                       for i in range(nb))

        z = packed_conv.instance_norm_packed(out, c)
        k1, b1 = _DenseParams(c * self.expansion_factor,
                              in_features=c, name="Dense_0")()
        k2, b2 = _DenseParams(c, in_features=c * self.expansion_factor,
                              name="Dense_1")()
        z = packed_conv.block_diag_dense(z, k1.astype(z.dtype), b1)
        z = act(z)
        z = packed_conv.block_diag_dense(z, k2.astype(z.dtype), b2)
        z = nn.Dropout(self.dropout)(z, deterministic=deterministic)
        out = out + z
        return out if packed_io else packed_conv.unpack_s2d(out, c)


class JLCLayer(nn.Module):
    """``depth`` stacked JLC blocks."""

    depth: int = 1
    kernel_sizes: Tuple[int, ...] = (1, 3, 5)
    groups: int = 1
    expansion_factor: int = 4
    activation: str = "gelu"
    dropout: float = 0.0
    packed_io: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        for _ in range(self.depth):
            x = JLC(
                kernel_sizes=self.kernel_sizes,
                groups=self.groups,
                expansion_factor=self.expansion_factor,
                activation=self.activation,
                dropout=self.dropout,
                packed_io=self.packed_io,
            )(x, deterministic)
        return x
