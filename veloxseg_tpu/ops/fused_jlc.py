"""Fused Pallas execution of a packed JLC block (TPU).

Reference semantics: ``model/components/conv_blocks.py:50-87`` — a JLC
block is (multi-kernel grouped conv → per-branch InstanceNorm+GELU →
residual sum) followed by (InstanceNorm → expand Dense → GELU → project
Dense → residual). The XLA packed path (``nn/conv_blocks.JLC._packed``)
computes this as ~15 separate HBM-materialized tensors per block; at the
flagship 128³/bs16 shapes the L0/L1 JLC streams dominate the train
step's HBM traffic (r4/r5 HLO byte attribution). These kernels execute
the whole block in two fused stages with all intermediates VMEM-resident:

- stage 1 (``_k1``): per-batch dense packed conv (27 taps × per-branch
  (8C → 8C) matmuls, K = 8C lanes), branch InstanceNorm (per logical
  channel over spatial×parity), exact GELU, residual sum. HBM: read x,
  read weights once (constant block → resident across the batch grid),
  write out1.
- stage 2 (``_k2``): InstanceNorm, parity-block-diagonal channel MLP
  (expand → GELU → project), residual. HBM: read out1, write out.

Backward is a custom VJP that RECOMPUTES (flash-style): stage-1 residuals
are just ``x``; ``_k1_bwd`` re-runs the conv to rebuild the norm
statistics and emits the conv-output cotangent ``dy``; the conv's own
input/weight gradients then run as ONE XLA conv-dgrad/wgrad pair
(``jax.vjp`` of the dense conv). ``_k2_bwd`` recomputes the MLP forward
and accumulates the (inflated) weight gradients across the batch grid
in VMEM. Net HBM per block ≈ 6 stream-sized tensors vs ~20+ for XLA.

Numerics match the XLA packed path: conv accumulates fp32, InstanceNorm
in fp32 (ε inside rsqrt, ``max(var, 0)``), GELU exact (erf) applied in
bf16, residual adds in stream dtype. Branch conv biases cancel inside
the branch InstanceNorm (exactly — a per-channel constant shifts the
mean only), so the fused path never reads them; their gradient is 0.

Only used when the multi-branch form is active, activation is GELU,
dropout is inactive, and the block's working set fits VMEM
(:func:`fused_preferred` — flagship L0/L1; L2/L3 take the grouped
im2col path in ``ops/packed_conv.py``).
"""

from __future__ import annotations

import functools
import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import packed_conv

_ENABLED = os.environ.get("VELOXSEG_FUSED_JLC", "1") != "0"
_FORCE_INTERPRET = False

_TAPS = [(a, b, c) for a in range(3) for b in range(3) for c in range(3)]

_SQRT_HALF = float(np.sqrt(0.5))
_INV_SQRT_2PI = float(1.0 / np.sqrt(2.0 * np.pi))


def set_enabled(value: bool) -> None:
    global _ENABLED
    _ENABLED = bool(value)


def enabled() -> bool:
    return _ENABLED


def _gelu_exact(x):
    """GELU (approximate=False) in the input dtype — matches
    ``nn.gelu(x, approximate=False)`` on the XLA path."""
    xf = x.astype(jnp.float32)
    return (x * (0.5 * (1.0 + lax.erf(xf * _SQRT_HALF))).astype(x.dtype))


def _gelu_grad_f32(x32):
    """d/dx gelu(x) = Φ(x) + x·φ(x), computed in fp32."""
    phi_big = 0.5 * (1.0 + lax.erf(x32 * _SQRT_HALF))
    phi_small = jnp.exp(-0.5 * x32 * x32) * _INV_SQRT_2PI
    return phi_big + x32 * phi_small


def _fold8(row, channels: int):
    """(1, 8C) → (1, C): sum over the 8 parity slots of the
    parity-major channel layout."""
    return row.reshape(8, channels).sum(axis=0, keepdims=True)


def _unfold8(row, channels: int):
    """(1, C) → (1, 8C): tile across the 8 parity slots."""
    return jnp.broadcast_to(row, (8, channels)).reshape(1, 8 * channels)


def _fold_stats(colsum, colsq, channels: int, count: float):
    """(1, 8C) column sums → per-logical-channel (mean, rsqrt(var+eps))
    folded over the 8 parity slots, broadcast back to (1, 8C)."""
    mean = _fold8(colsum, channels) / count
    var = _fold8(colsq, channels) / count - mean * mean
    r = lax.rsqrt(jnp.maximum(var, 0.0) + 1e-5)
    return _unfold8(mean, channels), _unfold8(r, channels)


# ---------------------------------------------------------------------------
# Stage 1: conv + branch-IN + GELU + residual
# ---------------------------------------------------------------------------

def _k1_kernel(x_ref, w_ref, o_ref, xpad_ref, *, nb: int, channels: int,
               spatial: Tuple[int, int, int]):
    s0, s1, s2 = spatial
    n = s0 * s1 * s2
    k8c = 8 * channels
    xpad_ref[:] = jnp.zeros_like(xpad_ref)
    xpad_ref[1:s0 + 1, 1:s1 + 1, 1:s2 + 1, :] = x_ref[0]
    x = x_ref[0].reshape(n, k8c)
    hsum = None
    for j in range(nb):
        acc = jnp.zeros((n, k8c), jnp.float32)
        for t, (a, b, c) in enumerate(_TAPS):
            xs = xpad_ref[a:a + s0, b:b + s1, c:c + s2, :].reshape(n, k8c)
            acc = acc + jnp.dot(
                xs, w_ref[t, :, j * k8c:(j + 1) * k8c],
                preferred_element_type=jnp.float32)
        mean8, r8 = _fold_stats(acc.sum(axis=0, keepdims=True),
                                (acc * acc).sum(axis=0, keepdims=True),
                                channels, float(n * 8))
        h = _gelu_exact(((acc - mean8) * r8).astype(x.dtype))
        hsum = h if hsum is None else hsum + h
    o_ref[0] = (x + hsum).reshape(s0, s1, s2, k8c)


def _k1_bwd_kernel(x_ref, w_ref, g_ref, dy_ref, xpad_ref, *, nb: int,
                   channels: int, spatial: Tuple[int, int, int]):
    """Recompute conv + stats; emit dy (cotangent at the conv output,
    branch-major) for the outer XLA conv dgrad/wgrad."""
    s0, s1, s2 = spatial
    n = s0 * s1 * s2
    k8c = 8 * channels
    count = float(n * 8)
    xpad_ref[:] = jnp.zeros_like(xpad_ref)
    xpad_ref[1:s0 + 1, 1:s1 + 1, 1:s2 + 1, :] = x_ref[0]
    g = g_ref[0].reshape(n, k8c)
    for j in range(nb):
        acc = jnp.zeros((n, k8c), jnp.float32)
        for t, (a, b, c) in enumerate(_TAPS):
            xs = xpad_ref[a:a + s0, b:b + s1, c:c + s2, :].reshape(n, k8c)
            acc = acc + jnp.dot(
                xs, w_ref[t, :, j * k8c:(j + 1) * k8c],
                preferred_element_type=jnp.float32)
        mean8, r8 = _fold_stats(acc.sum(axis=0, keepdims=True),
                                (acc * acc).sum(axis=0, keepdims=True),
                                channels, count)
        yhat = (acc - mean8) * r8
        # dh = g (residual sum distributes); dn = dh · gelu'(n), with n
        # evaluated at the bf16-cast value the forward GELU actually saw
        # (the cast's own derivative is treated as 1)
        n_b16 = yhat.astype(g.dtype)
        dn = g.astype(jnp.float32) * _gelu_grad_f32(
            n_b16.astype(jnp.float32))
        # InstanceNorm backward per logical channel (folded over parity):
        # dx = r·(dn − mean(dn) − ŷ·mean(dn·ŷ))
        mdn8 = _unfold8(_fold8(dn.sum(axis=0, keepdims=True),
                               channels) / count, channels)
        mdny8 = _unfold8(_fold8((dn * yhat).sum(axis=0, keepdims=True),
                                channels) / count, channels)
        dacc = r8 * (dn - mdn8 - yhat * mdny8)
        dy_ref[0, :, j * k8c:(j + 1) * k8c] = dacc.astype(dy_ref.dtype)


# ---------------------------------------------------------------------------
# Stage 2: IN + channel MLP + residual
# ---------------------------------------------------------------------------

def _k2_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
               channels: int, n: int):
    k8c = 8 * channels
    x = x_ref[0].reshape(n, k8c)
    xf = x.astype(jnp.float32)
    mean8, r8 = _fold_stats(xf.sum(axis=0, keepdims=True),
                            (xf * xf).sum(axis=0, keepdims=True),
                            channels, float(n * 8))
    z = ((xf - mean8) * r8).astype(x.dtype)
    z1 = jnp.dot(z, w1_ref[:], preferred_element_type=jnp.float32)
    z1 = (z1 + b1_ref[:].astype(jnp.float32)).astype(x.dtype)
    z1 = _gelu_exact(z1)
    z2 = jnp.dot(z1, w2_ref[:], preferred_element_type=jnp.float32)
    z2 = (z2 + b2_ref[:].astype(jnp.float32)).astype(x.dtype)
    o_ref[0] = (x + z2).reshape(x_ref.shape[1:])


def _k2_bwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, g_ref, dx_ref,
                   dw1_ref, db1_ref, dw2_ref, db2_ref, *,
                   channels: int, n: int):
    k8c = 8 * channels
    count = float(n * 8)
    x = x_ref[0].reshape(n, k8c)
    g = g_ref[0].reshape(n, k8c)
    xf = x.astype(jnp.float32)
    mean8, r8 = _fold_stats(xf.sum(axis=0, keepdims=True),
                            (xf * xf).sum(axis=0, keepdims=True),
                            channels, count)
    yhat = (xf - mean8) * r8
    z = yhat.astype(x.dtype)
    z1p = jnp.dot(z, w1_ref[:], preferred_element_type=jnp.float32)
    z1p = z1p + b1_ref[:].astype(jnp.float32)
    z1pb = z1p.astype(x.dtype)
    z1 = _gelu_exact(z1pb)

    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    gf = g.astype(jnp.float32)
    db2_ref[:] += gf.sum(axis=0, keepdims=True)
    dw2_ref[:] += jax.lax.dot_general(
        z1, g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dz1 = jax.lax.dot_general(
        g, w2_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dz1 = dz1 * _gelu_grad_f32(z1pb.astype(jnp.float32))
    db1_ref[:] += dz1.sum(axis=0, keepdims=True)
    dz1b = dz1.astype(x.dtype)
    dw1_ref[:] += jax.lax.dot_general(
        z, dz1b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dz = jax.lax.dot_general(
        dz1b, w1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    mdn8 = _unfold8(_fold8(dz.sum(axis=0, keepdims=True),
                           channels) / count, channels)
    mdny8 = _unfold8(_fold8((dz * yhat).sum(axis=0, keepdims=True),
                            channels) / count, channels)
    din = r8 * (dz - mdn8 - yhat * mdny8)
    dx_ref[0] = (g + din.astype(x.dtype)).reshape(x_ref.shape[1:])


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

def _stream_spec(s):
    return pl.BlockSpec((1, *s[1:]), lambda b: (b,) + (0,) * (len(s) - 1),
                        memory_space=pltpu.VMEM)


def _const_spec(s):
    return pl.BlockSpec(s, lambda b: (0,) * len(s),
                        memory_space=pltpu.VMEM)


def _k1_fwd(xp, wp, nb, interpret=False):
    b, s0, s1, s2, k8c = xp.shape
    c = k8c // 8
    kern = functools.partial(_k1_kernel, nb=nb, channels=c,
                             spatial=(s0, s1, s2))
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[_stream_spec(xp.shape), _const_spec(wp.shape)],
        out_specs=_stream_spec(xp.shape),
        out_shape=jax.ShapeDtypeStruct(xp.shape, xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((s0 + 2, s1 + 2, s2 + 2, k8c), xp.dtype)],
        interpret=interpret,
    )(xp, wp)


def _k1_bwd(xp, wp, g, nb, interpret=False):
    b, s0, s1, s2, k8c = xp.shape
    c = k8c // 8
    n = s0 * s1 * s2
    kern = functools.partial(_k1_bwd_kernel, nb=nb, channels=c,
                             spatial=(s0, s1, s2))
    dy_shape = (b, n, nb * k8c)
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[_stream_spec(xp.shape), _const_spec(wp.shape),
                  _stream_spec(xp.shape)],
        out_specs=_stream_spec(dy_shape),
        out_shape=jax.ShapeDtypeStruct(dy_shape, xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((s0 + 2, s1 + 2, s2 + 2, k8c), xp.dtype)],
        interpret=interpret,
    )(xp, wp, g)


def _k2_fwd(out1, big1, b1t, big2, b2t, interpret=False):
    b = out1.shape[0]
    k8c = out1.shape[-1]
    c = k8c // 8
    n = int(np.prod(out1.shape[1:-1]))
    kern = functools.partial(_k2_kernel, channels=c, n=n)
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[_stream_spec(out1.shape), _const_spec(big1.shape),
                  _const_spec(b1t.shape), _const_spec(big2.shape),
                  _const_spec(b2t.shape)],
        out_specs=_stream_spec(out1.shape),
        out_shape=jax.ShapeDtypeStruct(out1.shape, out1.dtype),
        interpret=interpret,
    )(out1, big1, b1t, big2, b2t)


def _k2_bwd(out1, big1, b1t, big2, g, interpret=False):
    b = out1.shape[0]
    k8c = out1.shape[-1]
    c = k8c // 8
    n = int(np.prod(out1.shape[1:-1]))
    e8c = big1.shape[-1]
    kern = functools.partial(_k2_bwd_kernel, channels=c, n=n)
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[_stream_spec(out1.shape), _const_spec(big1.shape),
                  _const_spec(b1t.shape), _const_spec(big2.shape),
                  _stream_spec(out1.shape)],
        out_specs=(
            _stream_spec(out1.shape),
            _const_spec((k8c, e8c)),
            _const_spec((1, e8c)),
            _const_spec((e8c, k8c)),
            _const_spec((1, k8c)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(out1.shape, out1.dtype),
            jax.ShapeDtypeStruct((k8c, e8c), jnp.float32),
            jax.ShapeDtypeStruct((1, e8c), jnp.float32),
            jax.ShapeDtypeStruct((e8c, k8c), jnp.float32),
            jax.ShapeDtypeStruct((1, k8c), jnp.float32),
        ),
        interpret=interpret,
    )(out1, big1, b1t, big2, g)


# ---------------------------------------------------------------------------
# Custom-VJP core over packed weights
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _fused_core(xp, wp, big1, b1t, big2, b2t, nb, interpret):
    out1 = _k1_fwd(xp, wp, nb, interpret)
    return _k2_fwd(out1, big1, b1t, big2, b2t, interpret)


def _fused_core_fwd(xp, wp, big1, b1t, big2, b2t, nb, interpret):
    out1 = _k1_fwd(xp, wp, nb, interpret)
    out = _k2_fwd(out1, big1, b1t, big2, b2t, interpret)
    return out, (xp, out1, wp, big1, b1t, big2)


def _fused_core_bwd(nb, interpret, res, g):
    xp, out1, wp, big1, b1t, big2 = res
    dout1, dbig1, db1t, dbig2, db2t = _k2_bwd(
        out1, big1, b1t, big2, g, interpret)
    dy = _k1_bwd(xp, wp, dout1, nb, interpret)
    b, s0, s1, s2, k8c = xp.shape
    dy = dy.reshape(b, s0, s1, s2, nb * k8c)
    # conv input/weight grads through XLA's dgrad/wgrad convs
    wp5 = wp.reshape(3, 3, 3, k8c, nb * k8c)
    _, conv_vjp = jax.vjp(
        lambda a, w: packed_conv.conv_packed(a, w), xp, wp5)
    dxp_conv, dwp5 = conv_vjp(dy)
    dxp = dout1 + dxp_conv
    return (dxp, dwp5.reshape(27, k8c, nb * k8c).astype(wp.dtype),
            dbig1.astype(big1.dtype), db1t.astype(b1t.dtype),
            dbig2.astype(big2.dtype), db2t.astype(b1t.dtype))


_fused_core.defvjp(_fused_core_fwd, _fused_core_bwd)


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------

def _vmem_estimate(shape, channels: int, nb: int, expansion: int) -> int:
    """Rough worst-stage VMEM bytes for the fused kernels (k1 bwd)."""
    n = int(np.prod(shape[1:4]))
    k8c = 8 * channels
    pad = int(np.prod([s + 2 for s in shape[1:4]])) * k8c * 2
    wbytes = 27 * k8c * nb * k8c * 2
    acc = n * k8c * 4
    streams = 3 * n * k8c * 2 * 2          # x, g, out1 double-buffered
    dy = n * nb * k8c * 2 * 2
    return pad + wbytes + acc + streams + dy


def set_force_interpret(value: bool) -> None:
    """Run the kernels in interpreter mode off-TPU (CPU tests)."""
    global _FORCE_INTERPRET
    _FORCE_INTERPRET = bool(value)


def usable(shape, channels: int, nb: int, expansion: int):
    """(use_fused, interpret) for a packed JLC block of this shape."""
    if not _ENABLED:
        return False, False
    if _vmem_estimate(shape, channels, nb, expansion) > (14 << 20):
        return False, False
    from .pwa_attention import _target_platform
    on_tpu = _target_platform() == "tpu"
    if on_tpu:
        # DISABLED on real TPU: Mosaic cannot lower the exact-erf GELU
        # (`lax.erf` → "Unimplemented primitive … erf", chip-verified
        # round 5). Re-enable once the kernel carries a fp32 polynomial
        # erf; the XLA packed path it falls back to is parity-tested and
        # was never measurably slower (the step is HBM-bound).
        return False, False
    if _FORCE_INTERPRET:
        return True, True
    return False, False


def jlc_block(xp: jnp.ndarray,
              weights: Sequence[Tuple[int, jnp.ndarray]],
              groups: int, w1: jnp.ndarray, b1: jnp.ndarray,
              w2: jnp.ndarray, b2: jnp.ndarray,
              interpret: bool = False) -> jnp.ndarray:
    """Fused packed JLC block on a parity-major stream.

    ``weights`` — [(k, W_k logical grouped weights)]; ``w1/b1/w2/b2`` the
    logical channel-MLP params. Identical math to the XLA
    ``JLC._packed`` path with ``multi=True`` and inactive dropout; conv
    branch biases are not consumed (they cancel in the branch IN — their
    gradient is exactly 0).
    """
    c = xp.shape[-1] // 8
    nb = len(weights)
    wp = packed_conv.packed_kernel(weights, c, groups)
    wp = wp.reshape(27, 8 * c, nb * 8 * c).astype(xp.dtype)
    eye = jnp.eye(8, dtype=w1.dtype)
    cin, hid = w1.shape
    big1 = (w1[None, :, None, :] * eye[:, None, :, None]).reshape(
        8 * cin, 8 * hid).astype(xp.dtype)
    big2 = (w2[None, :, None, :] * eye[:, None, :, None]).reshape(
        8 * hid, 8 * cin).astype(xp.dtype)
    b1t = packed_conv.tile_bias(b1, 1).astype(xp.dtype)[None, :]
    b2t = packed_conv.tile_bias(b2, 1).astype(xp.dtype)[None, :]
    return _fused_core(xp, wp, big1, b1t, big2, b2t, nb, interpret)
