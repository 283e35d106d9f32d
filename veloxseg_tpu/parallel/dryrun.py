"""Multi-chip dryrun: one SPMD training step on an n-device CPU mesh.

Run as ``python -m veloxseg_tpu.parallel.dryrun N`` with the CPU backend
forced *before* jax initializes (``__graft_entry__.dryrun_multichip``
spawns it that way in a subprocess, so it works even when the calling
process has already initialized a TPU backend).

The model is a **2-level micro VeloxSeg** — the real model class, the real
composite loss (CE+Dice deep supervision, MSE recon, Gram SDKT), the real
optimizer and the real (data × spatial) shardings of
:mod:`veloxseg_tpu.parallel.sharded_step` — shrunk so that the 8-device
GSPMD compile finishes in well under five minutes on a single CPU core
(the full 4-level model takes >4 min to compile *single-device* on one
core). Sharding semantics don't depend on depth: the step still exercises
the gradient all-reduce over ``data`` and conv halo exchange plus
window-attention resharding over ``spatial``.
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
    """2-level micro VeloxSeg config (see module docstring)."""
    from ..core.config import VeloxSegConfig

    return VeloxSegConfig(
        input_size=(16, 16, 16),
        patch_size=4,
        in_ch=(1, 1),          # keeps the multimodal cross-attention path
        n_classes=2,
        base_ch=4,
        attn_base_ch=4,
        conv_depths=(1, 1),
        kernel_sizes=(3,),
        min_dim_group=(4, 4),
        conv_expansion_factor=(2, 2),
        depths=(1, 1),
        min_big_window_sizes=((2, 2, 2), (2, 2, 2)),
        min_small_window_sizes=((1, 1, 1), (1, 1, 1)),
        min_dim_head=(4, 4),
        scale_factors=(2, 2),
        num_heads=(1, 1),
        ffn_expansion_ratio=(2, 2),
    )


def run(n_devices: int) -> float:
    """Build the mesh, jit the full sharded train step, run one step."""
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

    batch = max(2, data_size)
    if batch % data_size:
        batch = data_size

    x = jnp.zeros((batch, *cfg.input_size, sum(cfg.in_ch)), jnp.float32)
    y = jnp.zeros((batch, *cfg.input_size), jnp.int32)

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
    state, aux = step(state, x, y, jax.random.PRNGKey(2))
    jax.block_until_ready(aux["loss"])
    loss = float(aux["loss"])
    print(f"dryrun_multichip({n_devices}): mesh={dict(mesh.shape)} "
          f"loss={loss:.4f}")
    return loss


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    n = int(argv[0]) if argv else 8
    _force_cpu(n)
    run(n)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
