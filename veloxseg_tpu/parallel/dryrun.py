"""Multi-chip dryrun: one SPMD training step on an n-device CPU mesh.

Run as ``python -m veloxseg_tpu.parallel.dryrun N`` with the CPU backend
forced *before* jax initializes (``__graft_entry__.dryrun_multichip``
spawns it that way in a subprocess, so it works even when the calling
process has already initialized a TPU backend).

The model is a **full-depth (4-level) VeloxSeg** at 32³ with slim
channels — the real model class, the real composite loss (CE+Dice deep
supervision, MSE recon, Gram SDKT), the real optimizer and the real
(data × spatial) shardings of
:mod:`veloxseg_tpu.parallel.sharded_step` — sized so the 8-device GSPMD
compile finishes in a few minutes on a single CPU core. The step
exercises the gradient all-reduce over ``data``, conv halo exchange plus
window-attention resharding over ``spatial``, and every level of the
encoder/decoder. A second leg runs sliding-window inference with the
tile batch sharded over ``data`` (``infer/sliding_window.py``).
"""

from __future__ import annotations

import os
import sys


def _force_cpu(n_devices: int) -> None:
    """Force the CPU backend with ``n_devices`` virtual devices.

    Must run before any jax backend initialization. Handles the axon
    environment where a sitecustomize pre-imports jax: the env vars below
    are read lazily at backend-init time, and ``jax.config.update`` covers
    newer jax versions.
    """
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append(f"--xla_force_host_platform_device_count={n_devices}")
    os.environ["XLA_FLAGS"] = " ".join(flags)

    import jax
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_num_cpu_devices", n_devices)
    except Exception:
        pass  # older jax: the XLA_FLAGS path above covers it


def micro_config():
    """Full-depth slim VeloxSeg config (see module docstring)."""
    from ..core.config import VeloxSegConfig

    return VeloxSegConfig(
        input_size=(32, 32, 32),
        patch_size=4,
        in_ch=(1, 1),          # keeps the multimodal cross-attention path
        n_classes=2,
        base_ch=8,
        attn_base_ch=8,
        depths=(1, 1, 1, 1),
        min_big_window_sizes=((2, 2, 2), (2, 2, 2), (2, 2, 2), (1, 1, 1)),
    )


def _build(n_devices: int, batch: int = None):
    """Mesh + model + sharded step + placed batch (shared by run/bench)."""
    import jax
    import jax.numpy as jnp

    from ..nn.veloxseg import VeloxSeg
    from ..train.loss import CompositeLoss
    from ..train.optim import build_optimizer
    from ..train.train_state import create_train_state
    from .mesh import (batch_sharding, label_sharding, make_mesh,
                       replicate_sharding)
    from .sharded_step import make_sharded_train_step

    devices = jax.devices()[:n_devices]
    if len(devices) < n_devices:
        raise RuntimeError(
            f"need {n_devices} devices, backend has {len(devices)}")
    mesh = make_mesh(devices)
    data_size = mesh.shape["data"]
    spatial_size = mesh.shape["spatial"]

    cfg = micro_config()
    model = VeloxSeg(cfg)
    assert cfg.input_size[0] % spatial_size == 0

    if batch is None:
        batch = max(2, data_size)
    if batch % data_size:
        raise ValueError(f"batch {batch} not divisible by data={data_size}")

    # Random data, not zeros: the Gram feature loss normalizes by feature
    # norms, so an all-zero batch produces NaN *gradients* (finite loss)
    # and would poison the params the inference leg consumes.
    kx, ky = jax.random.split(jax.random.PRNGKey(3))
    x = jax.random.normal(
        kx, (batch, *cfg.input_size, sum(cfg.in_ch)), jnp.float32)
    y = jax.random.randint(
        ky, (batch, *cfg.input_size), 0, cfg.n_classes, jnp.int32)

    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)}, x, train=True)

    train_cfg = {
        "deep_Loss_weight": [1.0] * cfg.num_levels,
        "RC_Loss_weight": 0.5,
        "Feature_Loss_weight": 2.0,
    }
    loss_obj = CompositeLoss("VeloxSeg", train_cfg,
                             num_modal=cfg.num_modalities)
    tx = build_optimizer("adamw", {"lr": 2.5e-4, "weight_decay": 0.01})
    state = create_train_state(model, variables["params"], tx)

    state = jax.device_put(state, replicate_sharding(mesh))
    x = jax.device_put(x, batch_sharding(mesh))
    y = jax.device_put(y, label_sharding(mesh))

    step = make_sharded_train_step(mesh, loss_obj)
    return mesh, cfg, model, state, step, x, y


def run(n_devices: int) -> float:
    """Build the mesh, jit the full sharded train step, run one step."""
    import jax
    import jax.numpy as jnp

    mesh, cfg, model, state, step, x, y = _build(n_devices)
    state, aux = step(state, x, y, jax.random.PRNGKey(2))
    jax.block_until_ready(aux["loss"])
    loss = float(aux["loss"])
    print(f"dryrun_multichip({n_devices}): mesh={dict(mesh.shape)} "
          f"levels={cfg.num_levels} loss={loss:.4f}")

    # Leg 2: sliding-window inference, tile batch sharded over 'data'.
    from ..infer.sliding_window import sliding_window_inference
    predictor = lambda p, t: model.apply(  # noqa: E731
        {"params": p}, t, train=False)
    vol = jax.random.normal(
        jax.random.PRNGKey(4),
        (1, cfg.input_size[0] + cfg.input_size[0] // 2,
         *cfg.input_size[1:], sum(cfg.in_ch)), jnp.float32)
    logits = sliding_window_inference(
        vol, cfg.input_size, sw_batch_size=2, predictor=predictor,
        overlap=0.25, params=jax.device_get(state.params), mesh=mesh)
    jax.block_until_ready(logits)
    if not bool(jnp.isfinite(logits).all()):
        raise RuntimeError("sharded sliding-window produced non-finite "
                           "logits")
    print(f"dryrun_multichip({n_devices}): sharded sliding-window "
          f"out={tuple(logits.shape)} ok")
    return loss


def bench(n_devices: int, global_batch: int = 8, steps: int = 20) -> dict:
    """Time the SPMD step at fixed global batch; print one JSON line.

    On a shared-core CPU backend every virtual device runs on the same
    host CPU, so the total compute per step is constant across mesh sizes
    — ideal SPMD (sharding + GSPMD collectives) is **flat step time** vs
    ``n_devices``. The reported ratio vs the 1-device step therefore
    isolates partitioning/collective overhead, the only SPMD quantity
    measurable without real multi-chip hardware (PERF_NOTES "dp scaling").
    """
    import json
    import time

    import jax

    mesh, cfg, model, state, step, x, y = _build(
        n_devices, batch=global_batch)
    rng = jax.random.PRNGKey(2)
    state, aux = step(state, x, y, rng)  # compile
    jax.block_until_ready(aux["loss"])
    for _ in range(3):                   # warmup
        state, aux = step(state, x, y, rng)
    jax.block_until_ready(aux["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, aux = step(state, x, y, rng)
    jax.block_until_ready(aux["loss"])
    dt = time.perf_counter() - t0
    out = {"n_devices": n_devices, "mesh": dict(mesh.shape),
           "global_batch": global_batch, "steps": steps,
           "step_ms": round(dt / steps * 1e3, 2),
           "loss": round(float(aux["loss"]), 4)}
    print(json.dumps(out))
    return out


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    args = [a for a in argv if not a.startswith("--")]
    n = int(args[0]) if args else 8
    _force_cpu(n)
    if "--bench" in argv:
        bench(n, global_batch=int(args[1]) if len(args) > 1 else 8)
    else:
        run(n)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
