"""Training driver — the TPU-native equivalent of the reference's three
per-dataset trainers (``utils/train_autopet.py`` / ``train_hecktor.py`` /
``train_brats2021.py``).

One generic loop parameterized by a dataset profile (the three reference
files differ only in modality keys, foreground-crop usage and label/metric
handling — C5-C7 in SURVEY §2). Behavior parity:

- sorted-filename 60/20/20 split, effective batch = batch_size·num_samples
- epoch loop with warmup→main scheduler handoff stepped per epoch
- labels collapsed to binary for PET/CT datasets (``train_autopet.py:236``)
- val every ``val_interval`` epochs; checkpoints ``<epoch>.ckpt`` every
  ``save_model_interval`` + ``train_best`` / ``val_best`` under
  ``save/<dataset>/<model>/<MM_DD>[_index]/``
- TensorBoard scalars per iteration + per epoch, file+stdout logging

TPU-native deltas: one jitted train step (model+loss+backward+optimizer
fused), device metrics with 1-step-lagged host fetch so the tunnel sync
overlaps compute, threaded host-side data pipeline.
"""

from __future__ import annotations

import dataclasses
import math
import os
import time
from datetime import datetime
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.prefetch import prefetch_to_device
from ..data.dataset import (PatchLoader, SegmentationDataset,
                            default_train_transform, default_val_transform)
from ..models.registry import load_model
from ..utils.logger import get_logger
from ..utils.runtime import (rotation_range_from_degrees,
                             validate_selected_modal)
from ..utils.seed import DEFAULT_SEED, seed_everything
from .checkpoint import load_checkpoint, save_checkpoint
from .loss import CompositeLoss
from .metrics import segmentation_metrics
from .metrics_brats import brats_dice
from .optim import EpochScheduler, build_optimizer
from .train_state import create_train_state, eval_step_fn, train_step_fn


@dataclasses.dataclass(frozen=True)
class DatasetProfile:
    glob_keys: Tuple[str, ...]      # train-config dataset_path keys, order
    modality_names: Tuple[str, ...]
    use_foreground_crop: bool
    binary_label: bool
    raw_modal_count: int


PROFILES: Dict[str, DatasetProfile] = {
    "AutoPETII": DatasetProfile(("ct_path", "pet_path"), ("ct", "pet"),
                                True, True, 2),
    "Hecktor2022": DatasetProfile(("ct_path", "pet_path"), ("ct", "pet"),
                                  False, True, 2),
    "BraTS2021": DatasetProfile(
        ("flair_path", "t1_path", "t1ce_path", "t2_path"),
        ("flair", "t1", "t1ce", "t2"), False, False, 4),
}


def set_learning_rate(state, lr: float):
    """Update the injected LR hyper-parameter without recompiling."""
    opt_state = state.opt_state
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return state.replace(opt_state=opt_state._replace(hyperparams=hp))


def _fetch_aux(aux, n_sub: int = 0) -> list:
    """Fetch the step aux to host in ONE transfer.

    Returns a list of per-step dicts: one for a plain step (``n_sub=0``),
    ``n_sub`` for a multi-step dispatch whose aux leaves carry a leading
    K axis. A single ``device_get`` of the whole pytree replaces the old
    per-scalar ``float(v)`` fetches — each of those was a separate host
    round trip (~ms over the tunnel), which multiplies under
    ``steps_per_dispatch``.
    """
    host = jax.device_get(aux)

    def conv(h) -> Dict[str, float]:
        out = {k: float(v) for k, v in h.items() if k != "deep"}
        if "deep" in h:
            out["deep"] = tuple({k: float(v) for k, v in head.items()}
                                for head in h["deep"])
        return out

    if n_sub == 0:
        return [conv(host)]
    return [conv(jax.tree_util.tree_map(lambda a: a[i], host))
            for i in range(n_sub)]


def _grouped(it, k: int, stack=jnp.stack):
    """Group (x, y) batches into stacked (K, ...) pairs for multi-step
    dispatches. Same-shape groups only: a shape change (the final ragged
    batch) flushes pending items as single steps, which the single-step
    path handles without retracing the multi-step program. ``stack`` is
    ``jnp.stack`` for device batches (single-device path, post-prefetch)
    or ``np.stack`` for host batches (mesh path, pre-prefetch — the
    stack then ships to the mesh in one sharded transfer)."""
    if k <= 1:
        yield from it
        return
    group = []
    for xy in it:
        if group and np.shape(xy[0]) != np.shape(group[0][0]):
            for g in group:
                yield g
            group = []
        group.append(xy)
        if len(group) == k:
            yield (stack([g[0] for g in group]),
                   stack([g[1] for g in group]))
            group = []
    for g in group:
        yield g


def run_train(args, train_config: dict, model_config: dict) -> dict:
    """Main entry — signature parity with reference ``run_train``."""
    profile = PROFILES[args.dataset_name]
    if args.model_name not in model_config:
        raise ValueError(
            f"Model {args.model_name!r} not present in the model config; "
            f"available: {sorted(model_config)}")
    date = datetime.now().strftime("%m_%d")

    # Resume re-derives the run dir from the checkpoint path
    # (``train_autopet.py:69-86``).
    if getattr(args, "checkpoint_path", None):
        date = os.path.basename(
            os.path.dirname(args.checkpoint_path)) or date
        index = ""
    else:
        index = (f"_{args.model_index}"
                 if getattr(args, "model_index", None) else "")

    save_path = os.path.join(train_config["save_path"], args.dataset_name,
                             args.model_name, date + index)
    os.makedirs(save_path, exist_ok=True)
    # Multi-process (``--distributed``): every process runs the identical
    # program on identical host data (parallel/distributed.py); only
    # process 0 logs, writes TensorBoard and saves checkpoints.
    rank = jax.process_index()
    logger = get_logger(os.path.join(
        train_config.get("log_path", save_path),
        f"{args.dataset_name}_{args.model_name}_{date}{index}.log"),
        rank=rank)
    logger.info(f"Checkpoint Save path: {save_path}")
    logger.info(f"Now Model Config: \n{model_config[args.model_name]}\n")

    in_ch = model_config[args.model_name].get("in_ch", [1, 1])
    num_modal = len(in_ch) if isinstance(in_ch, (list, tuple)) else 1
    modal_index = validate_selected_modal(
        args.model_name, model_config,
        raw_modal_count=profile.raw_modal_count,
        select_modal=getattr(args, "select_modal", None))
    logger.info(f"Modal_index: {modal_index}")

    # Dataset --------------------------------------------------------
    patterns = {name: train_config["dataset_path"][args.dataset_name][k]
                for k, name in zip(profile.glob_keys,
                                   profile.modality_names)}
    patterns["label"] = \
        train_config["dataset_path"][args.dataset_name]["label_path"]
    dataset = SegmentationDataset.from_globs(patterns, args.dataset_name)
    train_files, val_files, _ = dataset.split(
        train_config["train_rate"], train_config["val_rate"])
    logger.info(f"The number of samples: {dataset.length}")
    logger.info(f"Training set includes: {len(train_files)}")
    logger.info(f"Validation set includes: {len(val_files)}")

    patch_size = train_config["patch_size"][args.dataset_name]
    num_workers = getattr(args, "num_workers", 4)
    # Parsed before the loaders: under SPMD the train loader must drop a
    # final ragged batch (it would not divide the mesh data axis, and a
    # second batch shape would retrace the step anyway).
    from ..parallel.mesh import parse_mesh_spec
    mesh = parse_mesh_spec(getattr(args, "mesh", None))
    # In-RAM decoded-volume cache (MONAI CacheDataset analogue): epochs
    # ≥ 2 skip NIfTI decode + foreground crop. Budget-bounded (default
    # 40% of host RAM), so whole-body datasets degrade to re-decoding
    # rather than OOM. "cache_dataset": false restores the reference's
    # re-decode-every-epoch Dataset behavior.
    cache = bool(train_config.get("cache_dataset", True))
    cache_bytes = (int(train_config["cache_max_gb"] * (1 << 30))
                   if "cache_max_gb" in train_config else None)
    if cache:
        logger.info("dataset cache enabled "
                    f"(budget {cache_bytes or 'default 40% RAM'})")
    train_loader = PatchLoader(
        train_files, profile.modality_names,
        default_train_transform(
            patch_size, num_samples=2, rotate_prob=0.5,
            range_z=rotation_range_from_degrees(15),
            use_foreground_crop=profile.use_foreground_crop),
        batch_size=train_config["batch_size"], num_samples=2,
        num_workers=num_workers, shuffle=True,
        modal_index=modal_index, binary_label=profile.binary_label,
        drop_last=mesh is not None, cache=cache,
        cache_max_bytes=cache_bytes)
    val_loader = PatchLoader(
        val_files, profile.modality_names,
        default_val_transform(
            patch_size, num_samples=2,
            use_foreground_crop=profile.use_foreground_crop),
        batch_size=train_config["batch_size"], num_samples=2,
        num_workers=num_workers, shuffle=False,
        modal_index=modal_index, binary_label=profile.binary_label,
        cache=cache, cache_max_bytes=cache_bytes)

    # Model / optimizer / loss --------------------------------------
    model = load_model(args.model_name, model_config)
    example = jnp.zeros(
        (1, *patch_size,
         sum(in_ch) if isinstance(in_ch, (list, tuple)) else in_ch),
        jnp.float32)
    root_key = seed_everything(DEFAULT_SEED)  # reference seed 12345 (C17)
    init_key, dropout_key, rng = jax.random.split(root_key, 3)
    variables = jax.jit(model.init, static_argnames="train")(
        {"params": init_key, "dropout": dropout_key}, example, train=True)

    opt_cfg = train_config["optimizer"]
    tx = build_optimizer(opt_cfg["optimizer_type"],
                         opt_cfg["optimizer_args"])
    state = create_train_state(model, variables["params"], tx)
    scheduler = EpochScheduler(train_config)
    blocked_scale = 0
    blocked_in_ch = None
    from ..nn.veloxseg import VeloxSeg as _VS
    if isinstance(model, _VS):
        # blocked-heads training: identical loss/metrics, no full-res
        # pixel-shuffle transposes in the step (nn/veloxseg.py)
        model = model.clone(train_blocked_heads=True)
        state = state.replace(apply_fn=model.apply)
        blocked_scale = model.cfg.patch_size
        blocked_in_ch = model.cfg.in_ch
    loss_obj = CompositeLoss(args.model_name, train_config,
                             num_modal=num_modal,
                             blocked_scale=blocked_scale,
                             blocked_in_ch=blocked_in_ch)

    start_epoch = 0
    best_train_dice = 0.0
    best_val_dice = 0.0
    if getattr(args, "checkpoint_path", None):
        payload = load_checkpoint(args.checkpoint_path,
                                  params_template=state.params,
                                  opt_state_template=state.opt_state)
        state = state.replace(params=payload["params"],
                              opt_state=payload["opt_state"])
        start_epoch = payload["epoch"] + 1
        best_train_dice = payload["best_train_dice"]
        best_val_dice = payload["best_val_dice"]
        scheduler.load_state_dict(payload.get("scheduler_state", {}))
        logger.info(f"Resumed from {args.checkpoint_path} at epoch "
                    f"{start_epoch}")

    # Device mesh (TPU-native addition — the reference is single-GPU).
    # ``--mesh`` shards the batch over ``data`` (grad all-reduce via psum)
    # and optionally the leading spatial axis over ``spatial``.
    # (``mesh`` itself was parsed above, before the loaders.)
    x_shard = None
    y_shard = None
    if mesh is not None:
        from ..parallel.mesh import (batch_sharding, label_sharding,
                                     replicate_sharding, shard_host_batch)
        from ..parallel.sharded_step import make_sharded_train_step
        eff_batch = train_config["batch_size"] * 2  # num_samples=2
        data_size = mesh.shape["data"]
        spatial_size = mesh.shape["spatial"]
        if eff_batch % data_size:
            raise ValueError(
                f"effective batch {eff_batch} (batch_size×num_samples) "
                f"must divide by mesh data axis {data_size}")
        spatial_shard = spatial_size > 1
        if spatial_shard and patch_size[0] % spatial_size:
            raise ValueError(
                f"patch depth {patch_size[0]} must divide by mesh spatial "
                f"axis {spatial_size}")
        logger.info(f"SPMD mesh: {dict(mesh.shape)}")
    # Per-deep-head metric reporting (reference ``show_deep_metric`` key,
    # ``utils/train_autopet.py:252`` → ``utils/metric/metrics.py:6-25``).
    show_deep = bool(train_config.get("show_deep_metric", True))
    if mesh is not None:
        step = make_sharded_train_step(mesh, loss_obj,
                                       compute_dtype=jnp.bfloat16,
                                       spatial_shard=spatial_shard,
                                       deep_metric_heads=show_deep)
        state = jax.device_put(state, replicate_sharding(mesh))
        x_shard = batch_sharding(mesh, spatial_shard)
        y_shard = label_sharding(mesh, spatial_shard)
    else:
        step = train_step_fn(loss_obj, compute_dtype=jnp.bfloat16,
                             deep_metric_heads=show_deep)
    # Dispatch amortization (TPU-native addition): ``steps_per_dispatch``
    # K>1 scans K optimizer steps inside ONE jitted dispatch
    # (train_state.train_multi_step_fn / parallel.make_sharded_multi_step)
    # — on hosts where per-dispatch latency rivals step compute (tunneled
    # chips, slow hosts) this keeps the chip busy between host round
    # trips.
    steps_per_dispatch = int(train_config.get("steps_per_dispatch", 1))
    # Gradient accumulation (TPU-native addition): ``grad_accum`` A>1
    # averages gradients over A loader batches before ONE optimizer
    # update (train_state.train_accum_step_fn) — effective batch A× at
    # one micro-batch's activation memory. Counts as one iteration per
    # update in the logs/TensorBoard. Mutually exclusive with
    # ``steps_per_dispatch`` (one scans optimizer steps, the other scans
    # gradient halves of ONE step); single-device path (under --mesh,
    # scale the batch over the data axis instead).
    grad_accum = int(train_config.get("grad_accum", 1))
    if grad_accum > 1 and steps_per_dispatch > 1:
        raise ValueError("grad_accum and steps_per_dispatch are mutually "
                         "exclusive")
    if grad_accum > 1 and mesh is not None:
        raise ValueError("grad_accum is a single-device feature; under "
                         "--mesh scale the global batch over the data "
                         "axis instead")
    multi_step = None
    accum_step = None
    if grad_accum > 1:
        from .train_state import train_accum_step_fn
        accum_step = train_accum_step_fn(loss_obj,
                                         compute_dtype=jnp.bfloat16,
                                         deep_metric_heads=show_deep)
        logger.info(f"grad_accum: {grad_accum}")
    elif steps_per_dispatch > 1:
        if mesh is None:
            from .train_state import train_multi_step_fn
            multi_step = train_multi_step_fn(loss_obj,
                                             compute_dtype=jnp.bfloat16,
                                             deep_metric_heads=show_deep)
        else:
            from ..parallel.sharded_step import make_sharded_multi_step
            multi_step = make_sharded_multi_step(
                mesh, loss_obj, compute_dtype=jnp.bfloat16,
                spatial_shard=spatial_shard, deep_metric_heads=show_deep)
        logger.info(f"steps_per_dispatch: {steps_per_dispatch}")
    eval_step = eval_step_fn(model.apply)
    sharded_eval = None
    if mesh is not None:
        # Validation shards over the mesh too (VERDICT r2 item 6: an
        # unsharded val loop crawls at single-chip speed on a pod). The
        # single-device eval_step remains the fallback for a ragged tail
        # batch that does not divide the data axis.
        from ..parallel.sharded_step import make_sharded_eval_step
        sharded_eval = make_sharded_eval_step(mesh, model.apply,
                                              spatial_shard=spatial_shard)

    writer = None
    if rank == 0:
        try:
            from torch.utils.tensorboard import SummaryWriter
            writer = SummaryWriter(os.path.join(save_path, "logs"))
        except Exception:   # pragma: no cover - tensorboard optional
            writer = None

    # Checkpoint writes: ``async_checkpoint`` in the train config switches
    # to non-blocking Orbax directory checkpoints (preemption recovery,
    # SURVEY §5); default is the reference-parity synchronous msgpack file.
    # Multi-process: the state is replicated, so process 0 writes the
    # msgpack file alone (the Orbax async path is single-process — its
    # committing protocol would need all-process participation).
    async_writer = None
    if train_config.get("async_checkpoint"):
        if jax.process_count() == 1:
            from .orbax_ckpt import AsyncCheckpointWriter
            async_writer = AsyncCheckpointWriter()
            logger.info("async (Orbax) checkpointing enabled")
        else:
            logger.info("async_checkpoint ignored under --distributed; "
                        "process 0 writes synchronous msgpack checkpoints")

    def save_ckpt(name: str, epoch: int) -> None:
        if rank != 0:
            return
        kwargs = dict(epoch=epoch, best_train_dice=best_train_dice,
                      best_val_dice=best_val_dice,
                      scheduler_state=scheduler.state_dict())
        if async_writer is not None:
            async_writer.save(os.path.join(save_path, name),
                              state.params, state.opt_state, **kwargs)
        else:
            save_checkpoint(os.path.join(save_path, name + ".ckpt"),
                            state.params, state.opt_state, **kwargs)

    # Host→device prefetch (``data/prefetch.py``): keep ``prefetch``
    # batch transfers in flight so the PatchLoader's threaded decode and
    # XLA's async H2D overlap the previous step's device compute — the
    # TPU analogue of torch DataLoader workers + pin_memory async copies.
    prefetch_size = int(train_config.get("prefetch", 2))
    if mesh is not None:
        from ..parallel.mesh import (stacked_batch_sharding,
                                     stacked_label_sharding)
        x_stack = stacked_batch_sharding(mesh, spatial_shard)
        y_stack = stacked_label_sharding(mesh, spatial_shard)

        def put_batch(batch):
            xs, ys = np.asarray(batch[0]), np.asarray(batch[1])
            if xs.ndim == 6:  # (K, B, ...) multi-step stack
                return (shard_host_batch(xs, x_stack),
                        shard_host_batch(ys, y_stack))
            return (shard_host_batch(xs, x_shard),
                    shard_host_batch(ys, y_shard))
    else:
        def put_batch(batch):
            xs, ys = batch
            return jnp.asarray(xs), jnp.asarray(ys)

    iteration = 0
    epochs = train_config["epochs"]

    # Observability (SURVEY §5): per-epoch patches/s meter, and an
    # optional ``profile_dir`` config key that captures a jax.profiler
    # device trace of steady-state dispatches (2–12, skipping the compile
    # dispatch; stops early at epoch end) of the first epoch —
    # TensorBoard profile plugin readable, the TPU-native replacement for
    # the reference's wall-clock deltas.
    from ..utils.profiling import ThroughputMeter
    profile_dir = train_config.get("profile_dir")
    prof = {"on": False, "done": False}

    def maybe_profile(n_dispatch: int) -> None:
        if not profile_dir or prof["done"]:
            return
        if not prof["on"] and n_dispatch >= 2:
            jax.profiler.start_trace(profile_dir)
            prof["on"] = True
        elif prof["on"] and n_dispatch >= 12:
            jax.profiler.stop_trace()
            prof.update(on=False, done=True)
            logger.info(f"profiler trace written to {profile_dir}")

    def log_train_aux(aux_f, epoch, it_in_epoch, n_batches):
        nonlocal iteration
        msg = (f"train {epoch + 1}/{epochs} {it_in_epoch}/{n_batches} "
               f"Training Loss:{aux_f['loss']:.4f} "
               f"[FP:{aux_f.get('fp_rate', 0):.4f}, "
               f"FN:{aux_f.get('fn_rate', 0):.4f}, "
               f"IoU:{aux_f.get('iou', 0):.4f}, "
               f"Dice:{aux_f.get('dice', 0):.4f}]")
        for head in aux_f.get("deep", ()):
            # show_deep_metrics line format (utils/metric/metrics.py:18,24)
            msg += (f"\n[FP:{head['fp_rate']:.4f}, "
                    f"FN:{head['fn_rate']:.4f}, "
                    f"IoU:{head['iou']:.4f}, Dice:{head['dice']:.4f} "
                    f"pix:{int(head['pred_pix']):6}/"
                    f"{int(head['label_pix']):6}]")
        logger.info(msg)
        if writer is not None:
            writer.add_scalar("Training Loss", aux_f["loss"], iteration)
            writer.add_scalar("Training FP", aux_f.get("fp_rate", 0),
                              iteration)
            writer.add_scalar("Training FN", aux_f.get("fn_rate", 0),
                              iteration)
            writer.add_scalar("Training IOU", aux_f.get("iou", 0),
                              iteration)
            writer.add_scalar("Training Dice", aux_f.get("dice", 0),
                              iteration)

    for epoch in range(start_epoch, epochs):
        state = set_learning_rate(state, scheduler.learning_rate(epoch))
        start = time.time()
        totals = {"loss": 0.0, "fp_rate": 0.0, "fn_rate": 0.0,
                  "iou": 0.0, "dice": 0.0}
        n_batches = 0
        pending = None  # 1-dispatch-lagged aux fetch
        logger.info(f"\n*** Start Epoch {epoch + 1} Training ***\n")

        def flush(p):
            nonlocal n_batches, iteration
            aux, n_sub = p
            for aux_f in _fetch_aux(aux, n_sub):
                iteration += 1
                for k in totals:
                    totals[k] += aux_f.get(k, 0.0)
                log_train_aux(aux_f, epoch, n_batches, len(train_loader))
                n_batches += 1

        if accum_step is not None:
            k_dispatch = grad_accum
        else:
            k_dispatch = steps_per_dispatch if multi_step is not None else 1
        if mesh is not None:
            # Mesh path: group on host and ship each K-stack in one
            # sharded transfer (stacked shardings in put_batch).
            src = prefetch_to_device(
                _grouped(iter(train_loader), k_dispatch, stack=np.stack),
                size=prefetch_size, put=put_batch)
        else:
            # Single-device path: prefetch overlaps the K per-batch H2D
            # copies with compute; stacking happens on device.
            src = _grouped(prefetch_to_device(train_loader,
                                              size=prefetch_size,
                                              put=put_batch), k_dispatch)
        meter = ThroughputMeter()
        n_dispatch = 0
        for x, y in src:
            rng, step_key = jax.random.split(rng)
            if x.ndim == 6 and accum_step is not None:
                state, aux = accum_step(state, x, y, step_key)
                n_sub = 0  # A micro-batches, ONE update, one log entry
            elif x.ndim == 6:
                state, aux = multi_step(state, x, y, step_key)
                n_sub = x.shape[0]
            else:
                state, aux = step(state, x, y, step_key)
                n_sub = 0
            meter.update(x.shape[0] * x.shape[1] if x.ndim == 6
                         else x.shape[0])
            n_dispatch += 1
            maybe_profile(n_dispatch)
            if pending is not None:
                flush(pending)
            pending = (aux, n_sub)
        if pending is not None:
            flush(pending)
        if prof["on"]:  # epoch shorter than the trace window
            jax.profiler.stop_trace()
            prof.update(on=False, done=True)
            logger.info(f"profiler trace written to {profile_dir}")

        means = {k: v / max(n_batches, 1) for k, v in totals.items()}
        mean_dice = means["dice"]

        if epoch % train_config["save_model_interval"] == 0:
            save_ckpt(str(epoch), epoch)
        if mean_dice >= best_train_dice:
            logger.info(f"get new best dice {best_train_dice} -> "
                        f"{mean_dice}, save new 'train_best.ckpt'")
            best_train_dice = mean_dice
            save_ckpt("train_best", epoch)

        logger.info(
            f"training epoch {epoch + 1}: average "
            f"[FP:{means['fp_rate']:.4f}, FN:{means['fn_rate']:.4f}, "
            f"IoU:{means['iou']:.4f}, Dice:{mean_dice:.4f}] "
            f"loss {means['loss']:.4f} time {time.time() - start:.1f}s "
            f"({meter.rate():.1f} patches/s)")

        # Validation --------------------------------------------------
        if (epoch + 1) % train_config["val_interval"] == 0:
            logger.info(f"\n*** Start Epoch {epoch + 1} Validating ***\n")
            vtotals = None
            vn = 0
            for xs, ys in val_loader:
                xs = np.asarray(xs)
                if (sharded_eval is not None
                        and xs.shape[0] % mesh.shape["data"] == 0):
                    pred, logits = sharded_eval(
                        state.params, shard_host_batch(xs, x_shard))
                else:
                    pred, logits = eval_step(state.params, jnp.asarray(xs))
                y = jnp.asarray(ys)
                if profile.binary_label:
                    m = {k: float(v) for k, v in
                         segmentation_metrics(y, pred).items()}
                    mkeys = ("fp_rate", "fn_rate", "iou", "dice")
                else:
                    m = {k: float(v) for k, v in
                         brats_dice(pred, y).items()}
                    mkeys = ("avg", "et", "tc", "wt")
                vtotals = (m if vtotals is None else
                           {k: vtotals[k] + m[k] for k in vtotals})
                vn += 1
            if vn:
                vmeans = {k: v / vn for k, v in vtotals.items()}
                val_dice = vmeans.get("dice", vmeans.get("avg", 0.0))
                logger.info(f"validation epoch {epoch + 1}: "
                            + " ".join(f"{k}:{v:.4f}"
                                       for k, v in vmeans.items()))
                if writer is not None:
                    for k, v in vmeans.items():
                        writer.add_scalar(f"Val {k}", v, epoch)
                scheduler.plateau_step(val_dice)
                if val_dice >= best_val_dice:
                    logger.info(f"get new best dice {best_val_dice} -> "
                                f"{val_dice}, save new 'val_best.ckpt'")
                    best_val_dice = val_dice
                    save_ckpt("val_best", epoch)

    if async_writer is not None:
        async_writer.wait()
        async_writer.close()
    if writer is not None:
        writer.close()
    return {"best_train_dice": best_train_dice,
            "best_val_dice": best_val_dice,
            "save_path": save_path,
            "state": state}
