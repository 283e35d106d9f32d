"""Parity tests for the packed (2x2x2 space-to-depth) attention branch.

Every helper in ``nn/pwa_packed.py`` must be numerically identical (up to
fp32 summation order) to its unpacked counterpart in ``nn/pwa.py`` /
``nn/patch.py`` on the same parameters; the full-model test pins the whole
packed execution (encoder attention + conv + decoders) against the
unpacked path with shared weights.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from veloxseg_tpu.core.windows import compute_window_layout
from veloxseg_tpu.nn import pwa_packed
from veloxseg_tpu.nn.pwa import window_gather, window_scatter
from veloxseg_tpu.ops import packed_conv


def _pair_major(y, pairs):
    """Voxel tensor (B, S, S, S, P*h*c) -> packed pair-major stream
    (B, S/2, S/2, S/2, P*8*h*c) matching the packed qkv output layout."""
    xp = packed_conv.pack_s2d(y)                    # (r, (p, hc))
    b, s0, s1, s2, k = xp.shape
    hc = k // (8 * pairs)
    xp = xp.reshape(b, s0, s1, s2, 8, pairs, hc)
    xp = xp.transpose(0, 1, 2, 3, 5, 4, 6)
    return xp.reshape(b, s0, s1, s2, k)


def _layouts():
    return [
        # even big windows, small=1 voxel tokens + even pooled smalls
        compute_window_layout((8, 8, 8), (2, 2, 2), (1, 1, 1), 2, 1, 4, 8),
        compute_window_layout((16, 16, 16), (4, 4, 4), (1, 1, 1), 2, 2, 8,
                              16),
        # bench stage-1 shape: min_big 8, tokens 8
        compute_window_layout((16, 16, 16), (8, 8, 8), (1, 1, 1), 2, 2, 8,
                              32),
        # 96³ flagship stage-0 shape: ODD 3³ big windows (per-pair
        # unpack fallback) + three even pooled pairs
        compute_window_layout((24, 24, 24), (3, 3, 3), (1, 1, 1), 2, 1, 4,
                              16),
    ]


@pytest.mark.parametrize("li", range(4))
def test_gather_parity(li):
    layout = _layouts()[li]
    rng = np.random.default_rng(li)
    c = layout.dim_qk * 2 + layout.dim_v
    ptot = layout.num_pairs * layout.num_heads * c
    y = jnp.asarray(rng.standard_normal(
        (2, *layout.input_size, ptot)), jnp.float32)
    assert pwa_packed.packable(layout, layout.input_size)
    ref = window_gather(y, layout, c)
    got = pwa_packed.window_gather_packed(
        _pair_major(y, layout.num_pairs), layout, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)


@pytest.mark.parametrize("li", range(4))
def test_scatter_parity(li):
    layout = _layouts()[li]
    rng = np.random.default_rng(10 + li)
    dv = layout.dim_v
    tokens = jnp.asarray(rng.standard_normal(
        (2, layout.num_heads, layout.num_windows, dv,
         layout.tokens_per_window)), jnp.float32)
    ref = window_scatter(tokens, layout, dv)        # (B, S³, P·h·dv)
    got = pwa_packed.window_scatter_packed(tokens, layout, dv)
    # packed output is pair-major: invert the channel permutation
    back = _pair_major(ref, layout.num_pairs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(back),
                               atol=1e-5, rtol=1e-5)


def test_seg_layer_norm_matches_per_slot_ln():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 6, 6, 6, 8 * 16)), jnp.float32)
    got = pwa_packed.seg_layer_norm(x, 8)
    v = np.asarray(x).reshape(4, 6, 6, 6, 8, 16)
    mean = v.mean(-1, keepdims=True)
    var = v.var(-1, keepdims=True)
    ref = ((v - mean) / np.sqrt(var + 1e-6)).reshape(x.shape)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5, rtol=1e-5)


def test_parity_kernel_expansions():
    """The expanded matmuls on a packed stream equal the logical Dense on
    the unpacked stream."""
    rng = np.random.default_rng(1)
    b, s, cin = 2, 4, 8
    pairs, cout = 3, 12
    x = jnp.asarray(rng.standard_normal((b, s, s, s, cin)), jnp.float32)
    xp = packed_conv.pack_s2d(x)
    # dense_parity
    w = jnp.asarray(rng.standard_normal((cin, cout)), jnp.float32)
    got = packed_conv.unpack_s2d(xp @ pwa_packed.dense_parity(w), cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x @ w),
                               atol=1e-5)
    # qkv_parity: output pair-major
    wq = jnp.asarray(rng.standard_normal((cin, pairs * cout)), jnp.float32)
    got = xp @ pwa_packed.qkv_parity(wq, pairs)
    ref = _pair_major(x @ wq, pairs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    # mix_parity: input pair-major
    wm = jnp.asarray(rng.standard_normal((pairs * cin, cout)), jnp.float32)
    xpm = _pair_major(jnp.tile(x, (1, 1, 1, 1, pairs)), pairs)
    got = packed_conv.unpack_s2d(xpm @ pwa_packed.mix_parity(wm, pairs),
                                 cout)
    ref = jnp.tile(x, (1, 1, 1, 1, pairs)) @ wm
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
    # concat_parity: concat of two packed streams
    c2 = 4
    y = jnp.asarray(rng.standard_normal((b, s, s, s, c2)), jnp.float32)
    wcat = jnp.asarray(rng.standard_normal((cin + c2, cout)), jnp.float32)
    cat_p = jnp.concatenate([xp, packed_conv.pack_s2d(y)], axis=-1)
    got = packed_conv.unpack_s2d(
        cat_p @ pwa_packed.concat_parity(wcat, [cin, c2]), cout)
    ref = jnp.concatenate([x, y], axis=-1) @ wcat
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_patch_embed_packed_parity():
    from veloxseg_tpu.nn.patch import PatchEmbed
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 16, 2)), jnp.float32)
    key = jax.random.PRNGKey(0)
    pe = PatchEmbed(embed_dim=8, patch_size=4, packed_out=False)
    pep = PatchEmbed(embed_dim=8, patch_size=4, packed_out=True)
    v = pe.init(key, x)
    ref = pe.apply(v, x)
    got = packed_conv.unpack_s2d(pep.apply(v, x), 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("packed_out", [False, True])
def test_patch_merging_packed_parity(packed_out):
    from veloxseg_tpu.nn.patch import PatchMerging
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 8, 8)), jnp.float32)
    key = jax.random.PRNGKey(0)
    pm = PatchMerging()
    v = pm.init(key, x)
    ref = pm.apply(v, x)                                # (2, 4³, 16)
    pmp = PatchMerging(packed_in=True, packed_out=packed_out)
    got = pmp.apply(v, packed_conv.pack_s2d(x))
    if packed_out:
        got = packed_conv.unpack_s2d(got, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_upconv_packed_in_parity():
    from veloxseg_tpu.nn.conv_blocks import UpConv
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 4, 16)), jnp.float32)
    key = jax.random.PRNGKey(0)
    up = UpConv(features=8)
    v = up.init(key, x)
    ref = up.apply(v, x)                                # (2, 8³, 8)
    xp = packed_conv.pack_s2d(x)
    got_p = UpConv(features=8, packed_in=True,
                   packed_out=True).apply(v, xp)
    np.testing.assert_allclose(
        np.asarray(packed_conv.unpack_s2d(got_p, 8)), np.asarray(ref),
        atol=1e-4, rtol=1e-4)
    got_u = UpConv(features=8, packed_in=True,
                   packed_out=False).apply(v, xp)
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def _tiny_cfg():
    from veloxseg_tpu.core.config import VeloxSegConfig
    return VeloxSegConfig().replace(
        input_size=(32, 32, 32), patch_size=4, in_ch=(1, 1), n_classes=2,
        base_ch=8, attn_base_ch=8, conv_depths=(1, 1, 1, 1),
        depths=(1, 1, 1, 1),
        min_big_window_sizes=((2, 2, 2), (2, 2, 2), (2, 2, 2), (1, 1, 1)),
        min_small_window_sizes=((1, 1, 1),) * 4, num_heads=(1, 2, 2, 4),
        proj_drop=0.0, attn_drop=0.0, conv_drop=0.0)


@pytest.mark.slow
def test_full_model_packed_parity():
    from veloxseg_tpu.nn.veloxseg import VeloxSeg
    cfg = _tiny_cfg()
    m = VeloxSeg(cfg)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 32, 32, 32, 2), jnp.float32)
    variables = jax.jit(m.init, static_argnames="train")(
        {"params": key, "dropout": key}, x, train=True)
    assert pwa_packed.enabled()
    ye_p = m.apply(variables, x, train=False)
    yt_p = m.apply(variables, x, train=True, rngs={"dropout": key})
    pwa_packed.set_enabled(False)
    try:
        ye_u = m.apply(variables, x, train=False)
        yt_u = m.apply(variables, x, train=True, rngs={"dropout": key})
        # identical param tree under both paths
        vu = jax.jit(m.init, static_argnames="train")(
            {"params": key, "dropout": key}, x, train=True)
        assert (jax.tree_util.tree_structure(vu)
                == jax.tree_util.tree_structure(variables))
        for a, b in zip(jax.tree_util.tree_leaves(vu),
                        jax.tree_util.tree_leaves(variables)):
            assert a.shape == b.shape
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    finally:
        pwa_packed.set_enabled(True)
    np.testing.assert_allclose(np.asarray(ye_p), np.asarray(ye_u),
                               atol=5e-4, rtol=1e-3)
    for i, (a, b) in enumerate(zip(yt_p, yt_u)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-2,
                                   err_msg=f"train output {i}")
