"""Input-pipeline overlap benchmark (VERDICT r2 item 8).

Measures the real-data training path — NIfTI decode → foreground crop →
pos/neg patch sampling → rotation → host→device prefetch → jitted train
step — against the same step fed from resident synthetic tensors, plus
the loader's host-only throughput ceiling. The reference has no such
measurement; its analogue is torch DataLoader workers + pin_memory
(``/root/reference/utils/train_autopet.py:193-211``).

Run manually (not part of the driver bench):
    python bench_loader.py [--cases N] [--workers W] [--shape D H W]

Caveat recorded with the results: this box has ONE host CPU core, so the
loader ceiling here is a floor on what a real TPU-VM host (dozens to
hundreds of cores) achieves; the interesting numbers are the overlap
efficiency (loader-fed step throughput vs min(loader, device ceilings))
and the prefetch on/off delta.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))

WARMUP_S = 2.0
TIMED_S = 10.0


def _build_fixtures(root, n_cases, shape):
    from make_fixtures import make_autopet_fixtures
    return make_autopet_fixtures(root, n_cases=n_cases, shape=shape)


def _make_loader(patterns, patch, batch_size, num_workers, cache=False):
    from veloxseg_tpu.data.dataset import (PatchLoader, SegmentationDataset,
                                           default_train_transform)
    ds = SegmentationDataset.from_globs(
        {"pet": patterns["pet_path"], "ct": patterns["ct_path"],
         "label": patterns["label_path"]}, "AutoPETII")
    train_files, _, _ = ds.split(0.8, 0.1)
    transform = default_train_transform(patch)
    return PatchLoader(train_files, ds.names, transform,
                       batch_size=batch_size, num_workers=num_workers,
                       drop_last=True, cache=cache)


def _train_setup(patch, batch, channels=2):
    from veloxseg_tpu.core.config import VeloxSegConfig
    from veloxseg_tpu.nn.veloxseg import VeloxSeg
    from veloxseg_tpu.train.loss import CompositeLoss
    from veloxseg_tpu.train.optim import build_optimizer
    from veloxseg_tpu.train.train_state import (create_train_state,
                                                train_step_fn)

    cfg = VeloxSegConfig().replace(depths=(1, 1, 1, 1),
                                   input_size=tuple(patch))
    model = VeloxSeg(cfg)
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, *patch, channels), jnp.float32)
    variables = jax.jit(model.init, static_argnames="train")(
        {"params": key, "dropout": key}, x0, train=True)
    tcfg = {"deep_Loss_weight": [1, 1, 1, 1], "RC_Loss_weight": 0.5,
            "Feature_Loss_weight": 2.0}
    loss_obj = CompositeLoss("VeloxSeg", tcfg, num_modal=channels)
    tx = build_optimizer("adamw", {"lr": 2.5e-4, "weight_decay": 0.01})
    state = create_train_state(model, variables["params"], tx)
    step = train_step_fn(loss_obj, compute_dtype=jnp.bfloat16)
    return state, step


def _timed_loop(fn, label, patches_per_step):
    # warmup
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < WARMUP_S:
        fn()
    steps = 0
    t0 = time.perf_counter()
    while True:
        fn()
        steps += 1
        dt = time.perf_counter() - t0
        if dt >= TIMED_S:
            break
    rate = steps * patches_per_step / dt
    print(f"{label}: {rate:,.1f} patches/s ({steps} steps / {dt:.1f}s)")
    return rate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", type=int, default=16)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--batch", type=int, default=8,
                    help="items per batch (x2 crops = patches per step)")
    ap.add_argument("--shape", type=int, nargs=3, default=(144, 144, 112))
    ap.add_argument("--patch", type=int, nargs=3, default=(96, 96, 96))
    args = ap.parse_args()
    patch = tuple(args.patch)
    patches_per_step = args.batch * 2  # num_samples=2 list_data_collate

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    with tempfile.TemporaryDirectory() as root:
        patterns = _build_fixtures(root, args.cases, tuple(args.shape))

        # 1) loader-only host ceiling (no device work), cold and cached
        host_rates = {}
        for cache in (False, True):
            loader = _make_loader(patterns, patch, args.batch, args.workers,
                                  cache=cache)
            if cache:
                for _ in loader:  # epoch 1 fills the cache
                    pass
            it_holder = [iter(loader)]

            def pull_host():
                try:
                    next(it_holder[0])
                except StopIteration:
                    it_holder[0] = iter(loader)
                    next(it_holder[0])
            tag = "cached epoch>=2" if cache else "cold decode"
            host_rates[cache] = _timed_loop(
                pull_host, f"loader-only ({tag})", patches_per_step)
        host_rate = host_rates[True]

        # 2) synthetic resident-batch step (device ceiling)
        state, step = _train_setup(patch, patches_per_step)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal(
            (patches_per_step, *patch, 2)), dtype=jnp.float32)
        y = jnp.asarray(
            (rng.standard_normal((patches_per_step, *patch)) > 1.2),
            dtype=jnp.int32)
        key = jax.random.PRNGKey(0)
        holder = [state]

        def synth_step():
            s, aux = step(holder[0], x, y, key)
            holder[0] = s
            jax.block_until_ready(aux["loss"])
        dev_rate = _timed_loop(synth_step, "synthetic step (device ceiling)",
                               patches_per_step)

        # 3) loader-fed step (cached loader), prefetch 1 (eager) vs 2
        from veloxseg_tpu.data.prefetch import prefetch_to_device
        fed_rates = {}
        for size in (1, 2):
            holder = [state]
            feed = [iter(prefetch_to_device(iter(loader), size=size))]

            def fed_step():
                try:
                    xb, yb = next(feed[0])
                except StopIteration:
                    feed[0] = iter(prefetch_to_device(iter(loader),
                                                      size=size))
                    xb, yb = next(feed[0])
                s, aux = step(holder[0], xb, yb, key)
                holder[0] = s
                jax.block_until_ready(aux["loss"])
            fed_rates[size] = _timed_loop(
                fed_step, f"loader-fed step (prefetch={size})",
                patches_per_step)

        ceiling = min(host_rate, dev_rate)
        best = max(fed_rates.values())
        print(f"\noverlap efficiency: {best / ceiling:.1%} of "
              f"min(host {host_rate:,.0f}, device {dev_rate:,.0f}) "
              f"patches/s; prefetch=2 vs eager: "
              f"{fed_rates[2] / fed_rates[1] - 1:+.1%}")


if __name__ == "__main__":
    main()
