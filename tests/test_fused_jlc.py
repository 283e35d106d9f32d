"""Fused Pallas JLC block (ops/fused_jlc.py) vs the XLA packed path.

Runs the kernels in interpreter mode on CPU (same gating pattern as the
attention-kernel tests). Reference semantics:
``model/components/conv_blocks.py:50-87``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from veloxseg_tpu.nn.conv_blocks import JLC
from veloxseg_tpu.ops import fused_jlc, packed_conv


def _make(c=16, groups=4, s=8, batch=2, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    xp = jnp.asarray(rng.standard_normal((batch, s, s, s, 8 * c)), dtype)
    blk = JLC(kernel_sizes=(1, 3, 5), groups=groups, expansion_factor=3,
              dropout=0.0, packed_io=True)
    variables = blk.init({"params": jax.random.PRNGKey(0)}, xp, True)
    params = jax.tree_util.tree_map(lambda a: a.astype(dtype),
                                    variables["params"])
    return blk, params, xp


def _apply(blk, params, xp):
    return blk.apply({"params": params}, xp, True,
                     rngs={"dropout": jax.random.PRNGKey(1)})


@pytest.mark.parametrize("c,groups", [(16, 4), (32, 4)])
def test_fused_forward_matches_xla(c, groups):
    blk, params, xp = _make(c=c, groups=groups, s=4)
    ref = _apply(blk, params, xp)
    fused_jlc.set_force_interpret(True)
    try:
        use, interp = fused_jlc.usable(xp.shape, c, 3, 3)
        assert use and interp
        out = _apply(blk, params, xp)
    finally:
        fused_jlc.set_force_interpret(False)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-4, atol=2e-4)


def test_fused_grads_match_xla():
    blk, params, xp = _make(c=16, groups=4, s=4)
    cot = jnp.asarray(
        np.random.default_rng(3).standard_normal(xp.shape), xp.dtype)

    def loss(p, x):
        return jnp.sum(_apply(blk, p, x).astype(jnp.float32)
                       * cot.astype(jnp.float32))

    gref = jax.grad(loss, argnums=(0, 1))(params, xp)
    fused_jlc.set_force_interpret(True)
    try:
        gfus = jax.grad(loss, argnums=(0, 1))(params, xp)
    finally:
        fused_jlc.set_force_interpret(False)

    # input grads
    np.testing.assert_allclose(np.asarray(gfus[1], np.float32),
                               np.asarray(gref[1], np.float32),
                               rtol=2e-3, atol=2e-3)
    flat_ref = jax.tree_util.tree_leaves_with_path(gref[0])
    flat_fus = dict(jax.tree_util.tree_leaves_with_path(gfus[0]))
    checked = 0
    for path, leaf in flat_ref:
        got = flat_fus[path]
        name = jax.tree_util.keystr(path)
        if "GroupedConv3d" in name and "bias" in name:
            # cancels exactly inside the branch InstanceNorm; the fused
            # path returns an exact 0 while XLA returns float noise
            assert float(jnp.max(jnp.abs(got))) == 0.0
            assert float(jnp.max(jnp.abs(leaf))) < 1e-4
            continue
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(leaf, np.float32),
            rtol=2e-3, atol=2e-3, err_msg=name)
        checked += 1
    assert checked >= 7  # 3 conv kernels + 2 dense kernels + 2 biases


def test_grouped_conv_matches_dense():
    rng = np.random.default_rng(0)
    for c, g, s in [(64, 8, 4), (32, 4, 4)]:
        cg = c // g
        ws = [(k, jnp.asarray(rng.standard_normal((k, k, k, cg, c)),
                              jnp.float32)) for k in (1, 3, 5)]
        xp = jnp.asarray(rng.standard_normal((2, s, s, s, 8 * c)),
                         jnp.float32)
        dense = packed_conv.conv_packed(
            xp, packed_conv.packed_kernel(ws, c, g))
        wg = packed_conv.packed_group_weights(ws, c, g)
        grp = packed_conv.conv_packed_grouped(xp, wg, c, g)
        np.testing.assert_allclose(np.asarray(grp), np.asarray(dense),
                                   rtol=1e-4, atol=1e-4)
