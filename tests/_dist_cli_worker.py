"""CLI worker process for tests/test_distributed.py (full trainer e2e).

Runs ``run_train`` end-to-end under ``--distributed`` as one process of
a 2-process x 2-virtual-CPU-devices cluster, on a workspace prepared by
the parent test, and prints the result dict for cross-rank comparison.

Usage: python tests/_dist_cli_worker.py <process_id> <num_processes>
       <port> <workspace_json>
"""

import json
import os
import sys


def main():
    pid, nproc, port, ws_path = (int(sys.argv[1]), int(sys.argv[2]),
                                 sys.argv[3], sys.argv[4])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_num_cpu_devices", 2)
    except Exception:
        pass

    with open(ws_path) as f:
        ws = json.load(f)

    from veloxseg_tpu.parallel.distributed import initialize_distributed
    initialize_distributed(
        f"coordinator=localhost:{port},num_processes={nproc},"
        f"process_id={pid}")
    # Establish the Gloo pairs NOW, while inter-process skew is small:
    # on this 1-core host the first big XLA compile can skew the two
    # processes by minutes, and Gloo's pair-connect timeout (~30 s) then
    # kills the first real collective. Once connected, pairs are reused
    # and execution-time waits are unbounded. (Real pods use ICI, not
    # Gloo — this is a CPU-cluster test artifact.)
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    warm_mesh = Mesh(np.asarray(jax.devices()), ("d",))
    warm = jax.make_array_from_callback(
        (jax.device_count(),), NamedSharding(warm_mesh, P("d")),
        lambda idx: np.ones(1, np.float32))
    jax.block_until_ready(jax.jit(
        jnp.sum, out_shardings=NamedSharding(warm_mesh, P()))(warm))

    from veloxseg_tpu.cli.train_main import main as train_main
    result = train_main([
        "--dataset_name", "AutoPETII",
        "--model_name", "VeloxSeg",
        "--train_config", ws["train_config"],
        "--model_config", ws["model_config"],
        "--num_workers", "2",
        "--model_index", f"dist{nproc}",
        "--mesh", "data=2,spatial=2",
        "--distributed",
        f"coordinator=localhost:{port},num_processes={nproc},"
        f"process_id={pid}",
    ])
    print("RESULT " + json.dumps(
        {"best_train_dice": result["best_train_dice"],
         "best_val_dice": result.get("best_val_dice"),
         "save_path": result["save_path"],
         "rank": jax.process_index()}), flush=True)

    # Leg 2: multi-host whole-volume inference through the test CLI
    # (tile batch over the global mesh; rank-0-only CSV writes).
    from veloxseg_tpu.cli.test_main import main as test_main
    df = test_main([
        "--dataset_name", "AutoPETII",
        "--model_name", "VeloxSeg",
        "--train_config", ws["train_config"],
        "--model_config", ws["model_config"],
        "--test_config", ws["test_config"],
        "--checkpoint_dir", result["save_path"],
        "--checkpoint_index", "train_best",
        "--mesh", "data=4,spatial=1",
        "--distributed",
        f"coordinator=localhost:{port},num_processes={nproc},"
        f"process_id={pid}",
    ])
    print("TEST_RESULT " + json.dumps(
        {"n": int(len(df)),
         "mean_dice": float(df["dice"].mean()) if len(df) else None,
         "rank": jax.process_index()}), flush=True)


if __name__ == "__main__":
    main()
