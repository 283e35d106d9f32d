"""WKV linear-attention recurrence — TPU-native equivalent of the
reference's only CUDA kernel (``compared_model/URWKV/cuda/wkv_cuda.cu``).

The RWKV4 recurrence per (batch, channel), numerically stabilized with a
running log-max exactly as the CUDA kernel does (``kernel_forward:8-38``):

    ww = u + k_t ; q = max(p, ww)
    y_t = (e^{p-q}·a + e^{ww-q}·v_t) / (e^{p-q}·b + e^{ww-q})
    ww = p + w   ; q' = max(ww, k_t)
    a ← e^{ww-q'}·a + e^{k_t-q'}·v_t ;  b ← e^{ww-q'}·b + e^{k_t-q'}
    p ← q'

Two implementations with identical numerics:
- :func:`wkv_scan` — ``jax.lax.scan`` over T with the state vectorized
  over (B, C); fully differentiable (scan transposes cleanly), used as
  the backward path and the CPU/interpret fallback.
- :func:`wkv_pallas` — a Pallas TPU kernel, grid over (B, C-tiles),
  sequential T-loop with the state resident in VMEM.

``wkv`` dispatches to Pallas on TPU with a custom VJP whose backward
recomputes via the scan reference (the CUDA backward also recomputes the
forward, ``kernel_backward:41-112``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

_NEG = -1e38


def wkv_scan(w: jnp.ndarray, u: jnp.ndarray, k: jnp.ndarray,
             v: jnp.ndarray) -> jnp.ndarray:
    """Reference implementation.

    Args:
      w: (C,) decay (the kernel receives ``-exp(time_decay)`` — pass the
         already-negated value, matching the CUDA caller).
      u: (C,) bonus.
      k, v: (B, T, C).
    Returns (B, T, C).
    """
    b, t, c = k.shape
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    wf = w.astype(jnp.float32)[None, :]
    uf = u.astype(jnp.float32)[None, :]

    def step(carry, kv_t):
        aa, bb, pp = carry
        kt, vt = kv_t
        ww = uf + kt
        q = jnp.maximum(pp, ww)
        e1 = jnp.exp(pp - q)
        e2 = jnp.exp(ww - q)
        y = (e1 * aa + e2 * vt) / (e1 * bb + e2)
        ww2 = pp + wf
        q2 = jnp.maximum(ww2, kt)
        e1b = jnp.exp(ww2 - q2)
        e2b = jnp.exp(kt - q2)
        aa = e1b * aa + e2b * vt
        bb = e1b * bb + e2b
        return (aa, bb, q2), y

    init = (jnp.zeros((b, c), jnp.float32), jnp.zeros((b, c), jnp.float32),
            jnp.full((b, c), _NEG, jnp.float32))
    kT = jnp.moveaxis(kf, 1, 0)
    vT = jnp.moveaxis(vf, 1, 0)
    _, ys = lax.scan(step, init, (kT, vT))
    return jnp.moveaxis(ys, 0, 1).astype(v.dtype)


def _wkv_kernel(w_ref, u_ref, k_ref, v_ref, y_ref):
    """Pallas body: one (batch, channel-tile) per program.

    Block shapes: w/u (1, ct); k/v/y (1, t, ct).
    """
    t_len = k_ref.shape[1]
    ct = k_ref.shape[2]
    wf = w_ref[0, :]
    uf = u_ref[0, :]

    def body(t, carry):
        aa, bb, pp = carry
        kt = k_ref[0, t, :]
        vt = v_ref[0, t, :]
        ww = uf + kt
        q = jnp.maximum(pp, ww)
        e1 = jnp.exp(pp - q)
        e2 = jnp.exp(ww - q)
        y_ref[0, t, :] = ((e1 * aa + e2 * vt) / (e1 * bb + e2)).astype(
            y_ref.dtype)
        ww2 = pp + wf
        q2 = jnp.maximum(ww2, kt)
        e1b = jnp.exp(ww2 - q2)
        e2b = jnp.exp(kt - q2)
        return e1b * aa + e2b * vt, e1b * bb + e2b, q2

    init = (jnp.zeros((ct,), jnp.float32), jnp.zeros((ct,), jnp.float32),
            jnp.full((ct,), _NEG, jnp.float32))
    lax.fori_loop(0, t_len, body, init)


def wkv_pallas(w, u, k, v, c_tile: int = 128):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, c = k.shape
    c_tile = min(c_tile, c)
    if c % c_tile:
        raise ValueError(f"C={c} not divisible by tile {c_tile}")
    grid = (b, c // c_tile)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    out = pl.pallas_call(
        _wkv_kernel,
        out_shape=jax.ShapeDtypeStruct((b, t, c), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, c_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, c_tile), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, c_tile), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, c_tile), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
    )(w.astype(jnp.float32)[None, :], u.astype(jnp.float32)[None, :],
      kf, vf)
    return out.astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def wkv(w, u, k, v):
    """WKV with Pallas forward on TPU, scan fallback elsewhere."""
    return _dispatch(w, u, k, v)


def _dispatch(w, u, k, v):
    from .pwa_attention import _target_platform
    if _target_platform() == "tpu":
        try:
            return wkv_pallas(w, u, k, v)
        except Exception:
            return wkv_scan(w, u, k, v)
    return wkv_scan(w, u, k, v)


def _wkv_fwd(w, u, k, v):
    return _dispatch(w, u, k, v), (w, u, k, v)


def _wkv_bwd(res, g):
    w, u, k, v = res
    _, vjp = jax.vjp(wkv_scan, w, u, k, v)
    return vjp(g)


wkv.defvjp(_wkv_fwd, _wkv_bwd)
