"""Multi-device SPMD tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-model XLA compiles
# default tier keeps mesh plumbing + the core SPMD-equals-single-device
# proof; the heavier sharded variants are `full`


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_mesh_factoring():
    from veloxseg_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(jax.devices())
    assert mesh.shape["data"] * mesh.shape["spatial"] == 8
    mesh2 = make_mesh(jax.devices()[:4], data=4, spatial=1)
    assert dict(mesh2.shape) == {"data": 4, "spatial": 1}


@pytest.mark.full
def test_dryrun_multichip_entrypoint():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "graft_entry", "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_sharded_step_matches_single_device():
    """The SPMD step on 4 devices must produce the same loss as the
    single-device step on the identical batch (numerics modulo reduction
    order)."""
    from veloxseg_tpu.core.config import VeloxSegConfig
    from veloxseg_tpu.nn.veloxseg import VeloxSeg
    from veloxseg_tpu.parallel.mesh import (batch_sharding, label_sharding,
                                            make_mesh, replicate_sharding)
    from veloxseg_tpu.parallel.sharded_step import make_sharded_train_step
    from veloxseg_tpu.train.loss import CompositeLoss
    from veloxseg_tpu.train.optim import build_optimizer
    from veloxseg_tpu.train.train_state import (create_train_state,
                                                train_step_fn)

    cfg = VeloxSegConfig(
        input_size=(32, 32, 32), patch_size=4, in_ch=(1, 1), n_classes=2,
        base_ch=8, attn_base_ch=8, depths=(1, 1, 1, 1),
        proj_drop=0.0, attn_drop=0.0, conv_drop=0.0,
        min_big_window_sizes=((2, 2, 2), (2, 2, 2), (2, 2, 2), (1, 1, 1)),
    )
    model = VeloxSeg(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 32, 2)),
                    dtype=jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, (2, 32, 32, 32)), dtype=jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)}, x, train=True)
    train_cfg = {"deep_Loss_weight": [1, 1, 1, 1], "RC_Loss_weight": 0.5,
                 "Feature_Loss_weight": 2.0}
    loss_obj = CompositeLoss("VeloxSeg", train_cfg, num_modal=2)

    def fresh_state():
        # the single-device step donates its state; give each state its
        # own param buffers
        tx = build_optimizer("adamw", {"lr": 2.5e-4, "weight_decay": 0.01})
        params = jax.tree_util.tree_map(jnp.copy, variables["params"])
        return create_train_state(model, params, tx)

    # Single-device.
    step1 = train_step_fn(loss_obj)
    _, aux1 = step1(fresh_state(), x, y, jax.random.PRNGKey(7))

    # 4-device mesh (2 data × 2 spatial).
    mesh = make_mesh(jax.devices()[:4], data=2, spatial=2)
    stepN = make_sharded_train_step(mesh, loss_obj)
    state = jax.device_put(fresh_state(), replicate_sharding(mesh))
    xs = jax.device_put(x, batch_sharding(mesh))
    ys = jax.device_put(y, label_sharding(mesh))
    _, auxN = stepN(state, xs, ys, jax.random.PRNGKey(7))

    assert float(auxN["loss"]) == pytest.approx(float(aux1["loss"]),
                                                rel=2e-3)


@pytest.mark.full
def test_sharded_multi_step_matches_sequential():
    """K scanned sharded steps per dispatch == K sequential sharded steps
    (steps_per_dispatch under --mesh; chained losses prove the scan
    tracks the sequential updates)."""
    from veloxseg_tpu.core.config import VeloxSegConfig
    from veloxseg_tpu.nn.veloxseg import VeloxSeg
    from veloxseg_tpu.parallel.mesh import (
        batch_sharding, label_sharding, make_mesh, replicate_sharding,
        stacked_batch_sharding, stacked_label_sharding)
    from veloxseg_tpu.parallel.sharded_step import (make_sharded_multi_step,
                                                    make_sharded_train_step)
    from veloxseg_tpu.train.loss import CompositeLoss
    from veloxseg_tpu.train.optim import build_optimizer
    from veloxseg_tpu.train.train_state import create_train_state

    cfg = VeloxSegConfig(
        input_size=(32, 32, 32), patch_size=4, in_ch=(1, 1), n_classes=2,
        base_ch=8, attn_base_ch=8, depths=(1, 1, 1, 1),
        proj_drop=0.0, attn_drop=0.0, conv_drop=0.0,
        min_big_window_sizes=((2, 2, 2), (2, 2, 2), (2, 2, 2), (1, 1, 1)),
    )
    model = VeloxSeg(cfg)
    rng = np.random.default_rng(3)
    k = 2
    x = jnp.asarray(rng.standard_normal((k, 2, 32, 32, 32, 2)),
                    dtype=jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, (k, 2, 32, 32, 32)),
                    dtype=jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)}, x[0], train=True)
    train_cfg = {"deep_Loss_weight": [1, 1, 1, 1], "RC_Loss_weight": 0.5,
                 "Feature_Loss_weight": 2.0}
    loss_obj = CompositeLoss("VeloxSeg", train_cfg, num_modal=2)
    mesh = make_mesh(jax.devices()[:4], data=2, spatial=2)

    def fresh_state():
        tx = build_optimizer("adamw", {"lr": 2.5e-4, "weight_decay": 0.01})
        params = jax.tree_util.tree_map(jnp.copy, variables["params"])
        return jax.device_put(create_train_state(model, params, tx),
                              replicate_sharding(mesh))

    key = jax.random.PRNGKey(11)

    step = make_sharded_train_step(mesh, loss_obj)
    seq_state = fresh_state()
    seq_losses = []
    for i in range(k):
        xi = jax.device_put(x[i], batch_sharding(mesh))
        yi = jax.device_put(y[i], label_sharding(mesh))
        seq_state, aux = step(seq_state, xi, yi, jax.random.fold_in(key, i))
        seq_losses.append(float(aux["loss"]))

    multi = make_sharded_multi_step(mesh, loss_obj, donate_batches=False)
    xs = jax.device_put(x, stacked_batch_sharding(mesh))
    ys = jax.device_put(y, stacked_label_sharding(mesh))
    _, auxs = multi(fresh_state(), xs, ys, key)
    # Step 0 matches exactly (same data/shardings/keys); step 1 carries
    # one AdamW update whose near-zero-grad elements amplify the
    # reduction-order differences between the scanned and standalone
    # GSPMD compilations (observed rel ~7e-5 on the CPU mesh).
    np.testing.assert_allclose(np.asarray(auxs["loss"]),
                               np.asarray(seq_losses), rtol=3e-4)
    assert abs(float(auxs["loss"][0]) - seq_losses[0]) < 1e-6
    assert auxs["dice"].shape == (k,)


@pytest.mark.full
def test_sharded_sliding_window_matches_single_device():
    """VERDICT r2 item 5: full-model sliding-window inference with the tile
    batch sharded over the mesh 'data' axis (fused eval attention ON via
    interpret mode, dispatched through shard_map) must reproduce the
    single-device volume."""
    from veloxseg_tpu.core.config import VeloxSegConfig
    from veloxseg_tpu.infer.sliding_window import sliding_window_inference
    from veloxseg_tpu.nn.veloxseg import VeloxSeg
    from veloxseg_tpu.ops import pwa_attention
    from veloxseg_tpu.parallel.mesh import make_mesh

    cfg = VeloxSegConfig(
        input_size=(32, 32, 32), patch_size=4, in_ch=(1, 1), n_classes=2,
        base_ch=8, attn_base_ch=8, depths=(1, 1, 1, 1),
        min_big_window_sizes=((2, 2, 2), (2, 2, 2), (2, 2, 2), (1, 1, 1)),
    )
    model = VeloxSeg(cfg)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((1, 48, 32, 32, 2)),
                    dtype=jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 32, 32, 32, 2), jnp.float32), train=False)
    params = variables["params"]
    predictor = lambda p, t: model.apply(  # noqa: E731
        {"params": p}, t, train=False)

    pwa_attention.set_force_interpret(True)
    try:
        single = sliding_window_inference(
            x, (32, 32, 32), 2, predictor, 0.25, params=params)
        mesh = make_mesh(jax.devices()[:4], data=4, spatial=1)
        sharded = sliding_window_inference(
            x, (32, 32, 32), 2, predictor, 0.25, params=params, mesh=mesh)
    finally:
        pwa_attention.set_force_interpret(False)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.full
def test_sharded_step_matches_single_device_with_fused_kernel():
    """VERDICT r2 item 2: the SPMD step with the fused Pallas attention ON
    (interpret mode on the CPU mesh) must reproduce the single-device step
    — loss AND parameter update, including the position-bias tables whose
    gradient crosses the shard_map boundary as a psum over 'data'. Runs
    with attention dropout enabled: the kernel's counter-based mask gets
    the global batch offset from axis_index, so shards reproduce the
    unsharded mask bit-for-bit."""
    from veloxseg_tpu.core.config import VeloxSegConfig
    from veloxseg_tpu.nn.veloxseg import VeloxSeg
    from veloxseg_tpu.ops import pwa_attention
    from veloxseg_tpu.parallel.mesh import (batch_sharding, label_sharding,
                                            make_mesh, replicate_sharding)
    from veloxseg_tpu.parallel.sharded_step import make_sharded_train_step
    from veloxseg_tpu.train.loss import CompositeLoss
    from veloxseg_tpu.train.optim import build_optimizer
    from veloxseg_tpu.train.train_state import (create_train_state,
                                                train_step_fn)

    cfg = VeloxSegConfig(
        input_size=(32, 32, 32), patch_size=4, in_ch=(1, 1), n_classes=2,
        base_ch=8, attn_base_ch=8, depths=(1, 1, 1, 1),
        proj_drop=0.0, attn_drop=0.3, conv_drop=0.0,
        min_big_window_sizes=((2, 2, 2), (2, 2, 2), (2, 2, 2), (1, 1, 1)),
    )
    model = VeloxSeg(cfg)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 32, 2)),
                    dtype=jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, (2, 32, 32, 32)), dtype=jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)}, x, train=True)
    train_cfg = {"deep_Loss_weight": [1, 1, 1, 1], "RC_Loss_weight": 0.5,
                 "Feature_Loss_weight": 2.0}
    loss_obj = CompositeLoss("VeloxSeg", train_cfg, num_modal=2)

    def fresh_state():
        tx = build_optimizer("adamw", {"lr": 2.5e-4, "weight_decay": 0.01})
        params = jax.tree_util.tree_map(jnp.copy, variables["params"])
        return create_train_state(model, params, tx)

    def bias_tables(params):
        out = {}

        def walk(path, tree):
            if isinstance(tree, dict):
                for k, v in tree.items():
                    walk(path + (k,), v)
            elif "pos_bias" in path:
                out["/".join(path)] = np.asarray(v_ := tree)
                del v_
        walk((), params)
        return out

    pwa_attention.set_force_interpret(True)
    try:
        assert pwa_attention.train_fused_enabled(16)  # kernel really on

        step1 = train_step_fn(loss_obj)
        state1, aux1 = step1(fresh_state(), x, y, jax.random.PRNGKey(7))
        tables1 = bias_tables(jax.device_get(state1.params))

        mesh = make_mesh(jax.devices()[:4], data=2, spatial=2)
        stepN = make_sharded_train_step(mesh, loss_obj)
        state = jax.device_put(fresh_state(), replicate_sharding(mesh))
        xs = jax.device_put(x, batch_sharding(mesh))
        ys = jax.device_put(y, label_sharding(mesh))
        stateN, auxN = stepN(state, xs, ys, jax.random.PRNGKey(7))
        tablesN = bias_tables(jax.device_get(stateN.params))
    finally:
        pwa_attention.set_force_interpret(False)

    assert float(auxN["loss"]) == pytest.approx(float(aux1["loss"]),
                                                rel=2e-3)
    assert tables1.keys() == tablesN.keys() and tables1
    for name in tables1:
        np.testing.assert_allclose(
            tablesN[name], tables1[name], atol=1e-5, rtol=1e-4,
            err_msg=f"pos-bias update diverged under SPMD: {name}")
