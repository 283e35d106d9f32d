"""Worker process for tests/test_distributed.py.

Runs one process of a 2-process x 2-virtual-CPU-devices-each cluster
(4 global devices), executes ONE sharded train step of the slim
full-depth VeloxSeg on a (data=2, spatial=2) GLOBAL mesh, and prints the
loss. The parent test compares it against the single-process 4-device
step on the identical batch.

Usage: python tests/_dist_worker.py <process_id> <num_processes> <port>
"""

import os
import sys


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_num_cpu_devices", 2)
    except Exception:
        pass
    jax.config.update("jax_default_matmul_precision", "highest")

    from veloxseg_tpu.parallel.distributed import initialize_distributed
    initialize_distributed(
        f"coordinator=localhost:{port},num_processes={nproc},"
        f"process_id={pid}")
    assert jax.process_count() == nproc
    assert jax.local_device_count() == 2
    assert jax.device_count() == 2 * nproc

    import numpy as np

    from veloxseg_tpu.core.config import VeloxSegConfig
    from veloxseg_tpu.nn.veloxseg import VeloxSeg
    from veloxseg_tpu.parallel.mesh import (batch_sharding, label_sharding,
                                            make_mesh, replicate_sharding,
                                            shard_host_batch)
    from veloxseg_tpu.parallel.sharded_step import make_sharded_train_step
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
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 32, 32, 32, 2)).astype(np.float32)
    y = rng.integers(0, 2, (2, 32, 32, 32)).astype(np.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)}, x, train=True)
    loss_obj = CompositeLoss(
        "VeloxSeg", {"deep_Loss_weight": [1, 1, 1, 1],
                     "RC_Loss_weight": 0.5, "Feature_Loss_weight": 2.0},
        num_modal=2)
    tx = build_optimizer("adamw", {"lr": 2.5e-4, "weight_decay": 0.01})
    state = create_train_state(model, variables["params"], tx)

    mesh = make_mesh(jax.devices(), data=2, spatial=2)
    state = jax.device_put(state, replicate_sharding(mesh))
    xs = shard_host_batch(x, batch_sharding(mesh))
    ys = shard_host_batch(y, label_sharding(mesh))
    step = make_sharded_train_step(mesh, loss_obj)
    state, aux = step(state, xs, ys, jax.random.PRNGKey(7))
    print(f"DIST_LOSS {float(aux['loss']):.6f}", flush=True)


if __name__ == "__main__":
    main()
