"""Space-to-depth ("packed") execution of small-channel grouped 3-D convs.

Why this exists
---------------
The reference's JLC blocks (``model/components/conv_blocks.py:50-62``) are
residual sums of parallel *grouped* convolutions (k ∈ {1,3,5}, group size
``min_dim_group`` = 4–16) over small channel counts (16–128). On the MXU a
grouped conv with 4 output channels per weight block can use at most
4/128ths of the systolic array, and XLA's grouped-conv emitter runs these
shapes at ~1–2 TF/s (fenced, chip-measured) — they dominate the train
step. The fix: execute the conv in a 2×2×2 space-to-depth ("packed")
layout. For even spatial dims, a stride-1 conv with odd k ≤ 5 becomes a
k=3 conv on the half-resolution grid with 8× the channels; the three
kernel sizes of a JLC block merge into ONE conv whose weights are
gathered at trace time from the *unchanged* grouped parameters (zeros
everywhere the kernel-size structure demands). Same math, same parameter
pytree, same checkpoints.

Stream channel layout — the flagship path runs PARITY-major (``groups=1``
in every helper): packed channel ``r·C + c`` for spatial parity
``r = (rd·2+rh)·2+rw`` and logical channel ``c``. Two execution forms for
the merged conv:

- ``conv_packed`` with a group-DENSIFIED ``packed_kernel`` — one dense
  MXU conv, G× zero-block FLOPs. Chip A/B showed it beats XLA's
  ``feature_group_count`` emitter (113 per-group convs) at every stage,
  and beats the logical grouped conv 12–48×. Right where the dense
  kernel is small (L0/L1: ≤ 10.6 MB).
- ``conv_packed_grouped`` — group-major im2col + ONE batched
  ``dot_general`` with the group axis as batch: no zero blocks (G× fewer
  FLOPs) and per-group weights (8·cg ≤ 128 wide), at the price of a
  27×-stream im2col. Right where the stream is small but the dense
  kernel would be huge (L2: 42 MB → 5.3 MB, L3: 170 MB → 21 MB — the
  dense variants dominated HLO byte attribution of the r4 train step).

Derivation: output voxel p = 2q + r_out needs input taps
x[p + o - k//2] = x[2(q + t) + r_in] with, per spatial dim,
``s = r_out + o - k//2``, ``t = s // 2 ∈ {-1,0,1}``, ``r_in = s % 2`` —
so every (tap, output-parity) pair lands on exactly one (packed-tap,
input-parity) slot of a 3³ packed kernel, and SAME padding of 1 packed
block reproduces the original SAME padding of k//2 ≤ 2 voxels.
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from jax import lax

_ENABLED = os.environ.get("VELOXSEG_PACKED_JLC", "1") != "0"


def set_enabled(value: bool) -> None:
    global _ENABLED
    _ENABLED = bool(value)


def enabled() -> bool:
    return _ENABLED


def pack_s2d(x: jnp.ndarray, groups: int = 1) -> jnp.ndarray:
    """(B, D, H, W, C) → (B, D/2, H/2, W/2, 8·C) in the group-major
    packed layout (packed channel = (g·8 + r)·cg + c)."""
    b, d, h, w, c = x.shape
    cg = c // groups
    x = x.reshape(b, d // 2, 2, h // 2, 2, w // 2, 2, groups, cg)
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6, 8)
    return x.reshape(b, d // 2, h // 2, w // 2, 8 * c)


def unpack_s2d(x: jnp.ndarray, channels: int, groups: int = 1) -> jnp.ndarray:
    """Inverse of :func:`pack_s2d`."""
    b, d, h, w, _ = x.shape
    cg = channels // groups
    x = x.reshape(b, d, h, w, groups, 2, 2, 2, cg)
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4, 8)
    return x.reshape(b, 2 * d, 2 * h, 2 * w, channels)


@lru_cache(maxsize=None)
def _scatter_matrix(k: int) -> np.ndarray:
    """Constant 0/1 matrix (k³, 27·64) scattering a flat (k,k,k) kernel
    into the packed (3·3·3 taps, rin=8, rout=8) slots, so the whole
    weight repack is ONE small matmul at trace time (an indexed gather
    here lowers to tiny loop fusions that cost real milliseconds/step)."""
    m = np.zeros((k ** 3, 3, 3, 3, 8, 8), np.float32)
    half = k // 2
    parities = [(a, b, c) for a in (0, 1) for b in (0, 1) for c in (0, 1)]
    for td in range(3):
        for th in range(3):
            for tw in range(3):
                for ri, rin in enumerate(parities):
                    for ro, rout in enumerate(parities):
                        o = [2 * (t - 1) + rin[d] - rout[d] + half
                             for d, t in enumerate((td, th, tw))]
                        if all(0 <= od < k for od in o):
                            m[(o[0] * k + o[1]) * k + o[2],
                              td, th, tw, ri, ro] = 1.0
    return m.reshape(k ** 3, 27 * 64)


def packed_kernel(weights: Sequence[Tuple[int, jnp.ndarray]], in_ch: int,
                  groups: int) -> jnp.ndarray:
    """Merge grouped-conv branch weights into one packed DENSE kernel.

    ``weights`` — [(k, W_k)] with W_k of shape (k,k,k, C_in/G, C_out); all
    k odd, k ≤ 5. Returns (3, 3, 3, 8·C_in, n_b·8·C_out): out-channel
    layout is BRANCH-major with the parity-major stream layout inside
    each branch block — so each branch's slice ``y[..., b·8C:(b+1)·8C]``
    is itself a valid packed stream.

    Dense (not ``feature_group_count=G``) is deliberate: XLA decomposes a
    feature-grouped conv into per-group convs inside the full program
    (113 conv ops and 5× the compile time at the flagship config, chip-
    traced) and forces a branch-sum over a non-contiguous channel factor
    that cost 24 ms/step — the dense kernel wastes G× FLOPs on zero
    blocks but runs at ~160 TF/s with contiguous branch slices, which is
    faster end-to-end at every stage.

    This repack runs INSIDE every train step (the params are the logical
    grouped weights), so it is built from a handful of fused ops: the
    group densification happens at LOGICAL scale (a (k³, G, cg, C_out)
    masked broadcast — tiny), then pad to kmax taps, ONE constant-matrix
    matmul into the packed tap/parity slots, one transpose. Densifying
    AFTER the packed expansion instead costs a G²-parity-sized zero-block
    intermediate whose forward+backward measured ~45 ms/step.
    """
    kmax = max(k for k, _ in weights)
    nb = len(weights)
    cout = weights[0][1].shape[-1]
    if groups > 1:
        # mask[g, o] = 1 iff out-channel o belongs to group g
        mask = jnp.asarray(
            np.repeat(np.eye(groups, dtype=np.float32),
                      cout // groups, axis=1))
    padded = []
    for k, w in weights:
        if groups > 1:
            d = (w[:, :, :, None, :, :]
                 * mask[:, None, :].astype(w.dtype)
                 ).reshape(k, k, k, in_ch, cout)
        else:
            d = w
        p = (kmax - k) // 2
        padded.append(jnp.pad(d, [(p, p)] * 3 + [(0, 0), (0, 0)]))
    wd = jnp.stack(padded, axis=-2)               # (K,K,K, Cin, nb, Cout)
    scatter = jnp.asarray(_scatter_matrix(kmax), dtype=wd.dtype)
    flat = wd.reshape(kmax ** 3, in_ch * nb * cout)
    g = (scatter.T @ flat).reshape(27, 8, 8, in_ch, nb, cout)
    # (27, rin, rout, Cin, nb, Cout) → (27, rin, Cin, nb, rout, Cout)
    g = g.transpose(0, 1, 3, 4, 2, 5)
    return g.reshape(3, 3, 3, 8 * in_ch, nb * 8 * cout)


def conv_packed(xp: jnp.ndarray, wp: jnp.ndarray) -> jnp.ndarray:
    """Dense SAME conv of a packed stream with a packed kernel."""
    return lax.conv_general_dilated(
        xp, wp.astype(xp.dtype), (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def packed_group_weights(weights: Sequence[Tuple[int, jnp.ndarray]],
                         in_ch: int, groups: int) -> jnp.ndarray:
    """Merge grouped-conv branch weights into PER-GROUP packed matmul
    weights ``(G, 27·8·cg, n_b·8·cgo)`` for :func:`conv_packed_grouped`.

    Same tap/parity scatter as :func:`packed_kernel` but without the
    group densification: no G× zero blocks, G² × smaller than the dense
    kernel. Row (K) factor order is ``(tap, r_in, c)``; column factor
    order ``(branch, r_out, c_out)`` — matching the im2col and output
    layouts of :func:`conv_packed_grouped`.
    """
    kmax = max(k for k, _ in weights)
    nb = len(weights)
    cout = weights[0][1].shape[-1]
    cg = in_ch // groups
    cgo = cout // groups
    padded = []
    for k, w in weights:
        p = (kmax - k) // 2
        # (k,k,k, cg, C) → (k,k,k, cg, G, cgo): out channel (g, c'),
        # in channels are group g's cg params.
        wg = w.reshape(k, k, k, cg, groups, cgo)
        padded.append(jnp.pad(wg, [(p, p)] * 3 + [(0, 0)] * 3))
    wd = jnp.stack(padded, axis=-2)        # (K,K,K, cg, G, nb, cgo)
    scatter = jnp.asarray(_scatter_matrix(kmax), dtype=wd.dtype)
    flat = wd.reshape(kmax ** 3, cg * groups * nb * cgo)
    g = (scatter.T @ flat).reshape(27, 8, 8, cg, groups, nb, cgo)
    # (tap, rin, rout, cg, G, nb, cgo) → (G, tap, rin, cg, nb, rout, cgo)
    g = g.transpose(4, 0, 1, 3, 5, 2, 6)
    return g.reshape(groups, 27 * 8 * cg, nb * 8 * cgo)


_TAPS3 = [(a, b, c) for a in range(3) for b in range(3) for c in range(3)]


def conv_packed_grouped(xp: jnp.ndarray, wg: jnp.ndarray, channels: int,
                        groups: int) -> jnp.ndarray:
    """Grouped SAME conv of a parity-major packed stream without group
    densification: group-major 27-tap im2col + one group-batched
    ``dot_general`` (K = 27·8·cg ≤ 3456, fully MXU-shaped).

    ``xp`` (B, S,S,S, 8·C) parity-major; ``wg`` from
    :func:`packed_group_weights`. Output (B, S,S,S, n_b·8·C) in the same
    branch-major / parity-major layout as :func:`conv_packed` with the
    densified kernel — bit-compatible consumers.

    The im2col materializes 27× the stream — use only where the stream
    is small (see :func:`grouped_preferred`); there it replaces a dense
    kernel G²× its size whose HBM reads dominated the step.
    """
    b, s0, s1, s2, k8c = xp.shape
    cg = channels // groups
    n = s0 * s1 * s2
    nbo = wg.shape[-1]          # nb·8·cgo
    xpad = jnp.pad(xp, [(0, 0), (1, 1), (1, 1), (1, 1), (0, 0)])
    parts = [xpad[:, a:a + s0, bb:bb + s1, c:c + s2, :]
             for a, bb, c in _TAPS3]
    xs = jnp.stack(parts, axis=-2)              # (B,S,S,S, 27, 8C)
    xs = xs.reshape(b, n, 27, 8, groups, cg)
    xs = xs.transpose(4, 0, 1, 2, 3, 5).reshape(groups, b * n,
                                                27 * 8 * cg)
    y = lax.dot_general(xs, wg.astype(xs.dtype),
                        (((2,), (1,)), ((0,), (0,))))  # (G, B·N, nb·8·cgo)
    nb = nbo // (8 * (channels // groups))
    y = y.reshape(groups, b, n, nb, 8, channels // groups)
    y = y.transpose(1, 2, 3, 4, 0, 5)           # (B, N, nb, rout, G, cgo)
    return y.reshape(b, s0, s1, s2, nb * 8 * channels)


def grouped_preferred(shape, channels: int, groups: int,
                      im2col_budget: int = 64 << 20) -> bool:
    """Choose :func:`conv_packed_grouped` over the dense kernel.

    DEFAULT OFF (opt-in via ``VELOXSEG_GROUPED_PACKED=1``): the byte
    model that motivated it (dense-kernel HBM reads dominating the step)
    was built on XLA cost-analysis bytes, which over-count ~2.6× — under
    honest fenced A/B the dense kernels win at every measured shape
    (96³ eval bs16: 676 vs 598 p/s; 128³ train bs32: 104.3 vs 102.9;
    PERF_NOTES round 5). The G× zero-block FLOPs are structural: a
    K=8·cg matmul fills the systolic array where the per-group K would
    idle it — executed-FLOP counts overstate its cost."""
    if os.environ.get("VELOXSEG_GROUPED_PACKED", "0") != "1":
        return False
    if groups <= 1:
        return False
    b = shape[0]
    n = int(np.prod(shape[1:4]))
    dense_bytes = 27 * (8 * channels) * (3 * 8 * channels) * 2
    im2col_bytes = b * n * 27 * 8 * channels * 2
    return dense_bytes >= (4 << 20) and im2col_bytes <= im2col_budget


def packable(spatial: Sequence[int]) -> bool:
    return _ENABLED and all(s % 2 == 0 and s >= 2 for s in spatial)


def branch_bias(biases: Sequence[jnp.ndarray], groups: int) -> jnp.ndarray:
    """Per-branch logical biases (n_b arrays of (C,)) → the packed
    (G·n_b·8·cog,) bias of :func:`conv_packed`'s output layout."""
    nb = len(biases)
    c = biases[0].shape[0]
    cog = c // groups
    b = jnp.stack(biases).reshape(nb, groups, cog)     # (nb, G, cog)
    b = jnp.broadcast_to(b.transpose(1, 0, 2)[:, :, None, :],
                         (groups, nb, 8, cog))
    return b.reshape(groups * nb * 8 * cog)


def tile_bias(bias: jnp.ndarray, groups: int = 1) -> jnp.ndarray:
    """Logical (C,) bias → packed (8·C,) bias in group-major layout."""
    c = bias.shape[0]
    cg = c // groups
    b = jnp.broadcast_to(bias.reshape(groups, 1, cg), (groups, 8, cg))
    return b.reshape(8 * c)


def instance_norm_packed(y: jnp.ndarray, channels: int, groups: int = 1,
                         branches: int = 1,
                         eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm of a packed stream — per logical channel over
    (spatial, parity) — identical statistics to the unpacked per-channel
    spatial normalization.

    ``y`` is (B, D, H, W, K) with K = G·branches·8·cog in the group-major
    conv-output layout (branches=1 for a plain stream): stats are
    computed per (group, branch, channel) by reducing the spatial axes
    first (big tensor → (B, K) in one fused reduce) and folding the 8
    parity slots on the small (B, K) tensor — the big tensor is never
    reshaped to a narrow-minor-dim view (TPU lane-padding poison)."""
    b = y.shape[0]
    k = y.shape[-1]
    cog = channels // groups
    xf = y.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=(1, 2, 3))                   # (B, K)
    s2 = jnp.sum(jnp.square(xf), axis=(1, 2, 3))       # (B, K)
    count = float(np.prod(y.shape[1:4]) * 8)
    s1 = jnp.sum(s1.reshape(b, groups, branches, 8, cog), axis=3)
    s2 = jnp.sum(s2.reshape(b, groups, branches, 8, cog), axis=3)
    mean = s1 / count
    var = s2 / count - jnp.square(mean)
    scale = lax.rsqrt(jnp.maximum(var, 0.0) + eps)  # (B, G, nb, cog)
    shift = mean * scale
    scale = jnp.broadcast_to(scale[:, :, :, None, :],
                             (b, groups, branches, 8, cog)
                             ).reshape(b, 1, 1, 1, k)
    shift = jnp.broadcast_to(shift[:, :, :, None, :],
                             (b, groups, branches, 8, cog)
                             ).reshape(b, 1, 1, 1, k)
    return (xf * scale - shift).astype(y.dtype)


@lru_cache(maxsize=None)
def _down_scatter_matrix(k: int, stride: int) -> np.ndarray:
    """Constant 0/1 matrix (k³, K'³·8) scattering a strided conv kernel
    into its packed-output form: a (kernel k, stride p, pad p−1) conv
    whose output is ALSO 2×2×2-packed is a (kernel k+p, stride 2p,
    pad (p−1, 0)) conv with per-output-parity shifted taps
    t_d = p·r_d + o_d."""
    kp = k + stride
    m = np.zeros((k ** 3, kp, kp, kp, 8), np.float32)
    parities = [(a, b, c) for a in (0, 1) for b in (0, 1) for c in (0, 1)]
    for od in range(k):
        for oh in range(k):
            for ow in range(k):
                for ri, r in enumerate(parities):
                    m[(od * k + oh) * k + ow,
                      stride * r[0] + od,
                      stride * r[1] + oh,
                      stride * r[2] + ow, ri] = 1.0
    return m.reshape(k ** 3, kp ** 3 * 8)


def _dense_from_grouped(w: jnp.ndarray, in_ch: int,
                        groups: int) -> jnp.ndarray:
    """(k,k,k, C_in/G, C_out) grouped weights → (k,k,k, C_in, C_out)
    block-diagonal dense weights (zeros off the group blocks). Only used
    for strided DownConvs (groups=1 in every flagship config)."""
    k = w.shape[0]
    cg = in_ch // groups
    out = w.shape[-1]
    og = np.arange(out) // (out // groups)            # group of each out-ch
    ci = og[None, :] * cg + np.arange(cg)[:, None]    # (cg, out)
    oc = np.broadcast_to(np.arange(out)[None, :], ci.shape)
    dense = jnp.zeros((k, k, k, in_ch, out), w.dtype)
    return dense.at[:, :, :, ci, oc].set(w)


def packed_out_kernel(w: jnp.ndarray, in_ch: int, groups: int,
                      stride: int, out_groups: int = 1) -> jnp.ndarray:
    """(k,k,k, C_in/G, C_out) weights of a (stride p, pad p−1) conv →
    (k+p, k+p, k+p, C_in, 8·C_out) weights whose (stride 2p, pad (p−1, 0))
    conv emits the 2×2×2-packed output stream directly, in the
    group-major layout of ``out_groups`` (the consumer level's group
    count). Use with :func:`conv_strided_packed_out`."""
    k = w.shape[0]
    dense = _dense_from_grouped(w, in_ch, groups) if groups > 1 else w
    cout = dense.shape[-1]
    cog = cout // out_groups
    kp = k + stride
    scatter = jnp.asarray(_down_scatter_matrix(k, stride), dtype=dense.dtype)
    flat = dense.reshape(k ** 3, in_ch * cout)
    g = (scatter.T @ flat).reshape(kp, kp, kp, 8, in_ch, out_groups, cog)
    g = g.transpose(0, 1, 2, 4, 5, 3, 6)          # (…, Cin, G, rout, cog)
    return g.reshape(kp, kp, kp, in_ch, 8 * cout)


def conv_strided_packed_out(x: jnp.ndarray, wp: jnp.ndarray,
                            stride: int) -> jnp.ndarray:
    """Strided conv with packed output: input (B, D, H, W, C_in)
    unpacked, output (B, D/2p, …, 8·C_out) packed."""
    p = stride
    return lax.conv_general_dilated(
        x, wp.astype(x.dtype), (2 * p,) * 3, [(p - 1, 0)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def gram_matrix_packed(xp: jnp.ndarray, channels: int,
                       groups: int = 1) -> jnp.ndarray:
    """Gram matrix of a packed stream — identical to
    ``gram_matrix(unpack_s2d(xp, channels, groups))`` without the
    unpack."""
    b = xp.shape[0]
    cg = channels // groups
    spatial = int(np.prod(xp.shape[1:4])) * 8
    xf = xp.reshape(b, -1, groups, 8, cg)
    g = lax.dot_general(
        xf, xf,
        dimension_numbers=(((1, 3), (1, 3)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )                                             # (B, G, cg, G, cg)
    g = g.reshape(b, channels, channels)
    return g / float(channels * spatial)


def block_diag_dense(x: jnp.ndarray, kernel: jnp.ndarray,
                     bias: jnp.ndarray | None, groups_in: int = 1,
                     groups_out: int = 1) -> jnp.ndarray:
    """Per-parity Dense on a packed stream without unpacking.

    ``x`` (…, 8·cin) in the group-major layout of ``groups_in``; applies
    the logical (cin → cout) ``kernel`` independently to each parity slot
    by expanding it to the permuted block-diagonal (8·cin, 8·cout) matrix
    whose output is in the group-major layout of ``groups_out`` — an
    MXU-shaped matmul instead of a lane-padded (…, 8, cin) reshape. 8×
    raw-FLOP inflation, but these matmuls are bandwidth-bound at JLC
    widths, so the wall cost is the clean layout's."""
    cin, cout = kernel.shape
    cgi = cin // groups_in
    cgo = cout // groups_out
    eye = jnp.eye(8, dtype=kernel.dtype)
    k4 = kernel.reshape(groups_in, cgi, groups_out, cgo)
    # (Gi, r, cgi, Go, r', cgo)
    big = (k4[:, None, :, :, None, :] * eye[None, :, None, None, :, None]
           ).reshape(8 * cin, 8 * cout)
    y = x @ big.astype(x.dtype)
    if bias is not None:
        y = y + tile_bias(bias, groups_out).astype(y.dtype)
    return y
