"""Packed (space-to-depth) JLC execution == unpacked grouped-conv JLC.

The packed path (``ops/packed_conv.py``) re-executes the reference's JLC
block (``model/components/conv_blocks.py:50-75``) as ONE dense conv on a
2×2×2-packed grid, gathering the merged kernel from the unchanged grouped
parameters at trace time. These tests pin:

1. exact same parameter pytree (shapes + names) for both paths;
2. forward equality (fp32, rtol ~1e-5) across channel/group/shape combos;
3. gradient equality wrt params and input;
4. the raw packed conv == lax grouped conv for each kernel size alone;
5. odd spatial dims fall back to the unpacked path (still correct).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from veloxseg_tpu.nn.conv_blocks import JLC
from veloxseg_tpu.ops import packed_conv


def _tree_shapes(tree):
    return jax.tree_util.tree_map(lambda a: a.shape, tree)


def _init_and_apply(x, *, packed, groups, kernel_sizes=(1, 3, 5),
                    expansion_factor=3):
    old = packed_conv.enabled()
    packed_conv.set_enabled(packed)
    try:
        block = JLC(kernel_sizes=kernel_sizes, groups=groups,
                    expansion_factor=expansion_factor)
        variables = block.init(jax.random.PRNGKey(0), x,
                               deterministic=True)
        out = block.apply(variables, x, deterministic=True)
        return variables, out, block
    finally:
        packed_conv.set_enabled(old)


@pytest.mark.parametrize("shape,groups", [
    ((2, 8, 8, 8, 16), 4),
    ((1, 4, 8, 6, 32), 8),
    ((1, 4, 4, 4, 8), 1),
])
def test_packed_jlc_matches_unpacked(shape, groups):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    v_u, out_u, _ = _init_and_apply(x, packed=False, groups=groups)
    v_p, out_p, block = _init_and_apply(x, packed=True, groups=groups)

    # identical parameter pytrees (names AND shapes)
    assert _tree_shapes(v_u["params"]) == _tree_shapes(v_p["params"])

    # and with the UNPACKED path's params fed to the PACKED path:
    old = packed_conv.enabled()
    packed_conv.set_enabled(True)
    try:
        out_x = block.apply(v_u, x, deterministic=True)
    finally:
        packed_conv.set_enabled(old)
    np.testing.assert_allclose(np.asarray(out_x), np.asarray(out_u),
                               rtol=2e-5, atol=2e-5)


def test_packed_jlc_gradients_match():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 8, 16)), jnp.float32)
    v, _, block = _init_and_apply(x, packed=False, groups=4)

    def loss(params, x, packed):
        old = packed_conv.enabled()
        packed_conv.set_enabled(packed)
        try:
            out = block.apply({"params": params}, x, deterministic=True)
        finally:
            packed_conv.set_enabled(old)
        return jnp.sum(jnp.square(out))

    gu_p, gu_x = jax.grad(loss, argnums=(0, 1))(v["params"], x, False)
    gp_p, gp_x = jax.grad(loss, argnums=(0, 1))(v["params"], x, True)
    np.testing.assert_allclose(np.asarray(gp_x), np.asarray(gu_x),
                               rtol=5e-4, atol=5e-4)

    def check(path, u, p):
        # atol floor 2e-3: the conv-bias gradients are exactly zero in
        # exact arithmetic (bias → InstanceNorm is shift-invariant), so
        # both paths produce only fp32 cancellation noise there.
        np.testing.assert_allclose(np.asarray(p), np.asarray(u),
                                   rtol=5e-4, atol=2e-3,
                                   err_msg=jax.tree_util.keystr(path))
    jax.tree_util.tree_map_with_path(check, gu_p, gp_p)


@pytest.mark.parametrize("k", [1, 3, 5])
@pytest.mark.parametrize("groups", [1, 4])
def test_packed_kernel_matches_lax_grouped_conv(k, groups):
    """Raw op check: pack → conv(packed_kernel) → unpack == grouped conv."""
    rng = np.random.default_rng(k * 10 + groups)
    cin, cout = 16, 16
    x = jnp.asarray(rng.standard_normal((2, 6, 8, 10, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, k, k, cin // groups, cout)),
                    jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(k // 2, k // 2)] * 3,
        feature_group_count=groups,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    wp = packed_conv.packed_kernel([(k, w)], cin, groups)
    got = packed_conv.unpack_s2d(
        packed_conv.conv_packed(packed_conv.pack_s2d(x), wp), cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_multi_branch_packed_kernel_layout():
    """Three branches merge with the documented BRANCH-major out layout:
    branch b's slice ``y[..., b·8C:(b+1)·8C]`` is itself a packed stream
    equal to that branch's grouped conv."""
    rng = np.random.default_rng(7)
    cin = 8
    groups = 2
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 6, cin)), jnp.float32)
    ks = (1, 3, 5)
    ws = [jnp.asarray(rng.standard_normal((k, k, k, cin // groups, cin)),
                      jnp.float32) for k in ks]
    wp = packed_conv.packed_kernel(list(zip(ks, ws)), cin, groups)
    y = packed_conv.conv_packed(packed_conv.pack_s2d(x), wp)
    for i, (k, w) in enumerate(zip(ks, ws)):
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), [(k // 2, k // 2)] * 3,
            feature_group_count=groups,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        got = packed_conv.unpack_s2d(
            y[..., i * 8 * cin:(i + 1) * 8 * cin], cin)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_group_major_helpers_roundtrip_and_norm():
    """pack/unpack with groups>1 roundtrips; grouped instance norm and
    block-diag dense match their logical counterparts on the group-major
    layout."""
    from veloxseg_tpu.nn.norms import InstanceNorm
    rng = np.random.default_rng(21)
    c, g = 12, 3
    x = jnp.asarray(rng.standard_normal((2, 4, 6, 8, c)) * 2 + 1,
                    jnp.float32)
    xp = packed_conv.pack_s2d(x, g)
    np.testing.assert_array_equal(
        np.asarray(packed_conv.unpack_s2d(xp, c, g)), np.asarray(x))
    ref = InstanceNorm().apply({}, x)
    got = packed_conv.unpack_s2d(
        packed_conv.instance_norm_packed(xp, c, g), c, g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    # block-diag dense: group-major in → parity-major hidden → group-major
    cout = 8
    w1 = jnp.asarray(rng.standard_normal((c, cout)), jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((cout, c)), jnp.float32)
    h = packed_conv.block_diag_dense(xp, w1, b1, groups_in=g)
    z = packed_conv.block_diag_dense(h, w2, None, groups_out=g)
    ref2 = (x @ w1 + b1) @ w2
    np.testing.assert_allclose(
        np.asarray(packed_conv.unpack_s2d(z, c, g)), np.asarray(ref2),
        rtol=1e-4, atol=1e-4)
    # gram off the group-major stream == gram of the unpacked tensor
    from veloxseg_tpu.ops.gram import gram_matrix
    np.testing.assert_allclose(
        np.asarray(packed_conv.gram_matrix_packed(xp, c, g)),
        np.asarray(gram_matrix(x)), rtol=1e-5, atol=1e-5)


def test_instance_norm_packed_matches_unpacked():
    from veloxseg_tpu.nn.norms import InstanceNorm
    rng = np.random.default_rng(9)
    c = 6
    x = jnp.asarray(rng.standard_normal((2, 4, 6, 8, c)) * 3 + 1,
                    jnp.float32)
    ref = InstanceNorm().apply({}, x)
    got = packed_conv.unpack_s2d(
        packed_conv.instance_norm_packed(packed_conv.pack_s2d(x), c), c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_block_diag_dense_matches_per_parity_dense():
    rng = np.random.default_rng(11)
    cin, cout = 5, 7
    x = jnp.asarray(rng.standard_normal((3, 4, 8 * cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((cin, cout)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
    got = packed_conv.block_diag_dense(x, w, b)
    ref = (x.reshape(3, 4, 8, cin) @ w + b).reshape(3, 4, 8 * cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_odd_dims_fall_back():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 5, 8, 8, 16)), jnp.float32)
    assert not packed_conv.packable(x.shape[1:4])
    v_u, out_u, _ = _init_and_apply(x, packed=False, groups=4)
    v_p, out_p, _ = _init_and_apply(x, packed=True, groups=4)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_u),
                               rtol=1e-6, atol=1e-6)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 4, 6, 8, 5)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(packed_conv.unpack_s2d(packed_conv.pack_s2d(x), 5)),
        np.asarray(x))
