"""Whole-volume inference drivers.

Parity targets: ``utils/inference_petct.py`` (AutoPET-II / Hecktor2022) and
``utils/inference_brats.py`` (BraTS2021):

- test split = last 20% of the sorted file list (``inference_petct.py:76``)
- sliding-window prediction with config overlap (constant blending —
  the reference's effective default)
- volumes > 500·500·1000 voxels accumulate on host
  (``inference_petct.py:213-222``)
- per-case FP/FN/Prec/Rec/F1/IoU/Dice (+ optional HD95 with header
  spacing) + wall time → CSV (``:249-257``); BraTS reports ET/TC/WT dice
  (+HD95)
- ``--specific_sample`` exports inputs + prediction as NIfTI instead
  (``:197-206,244-246``; BraTS also exports region masks ``:221-251``)
"""

from __future__ import annotations

import os
import time
from datetime import datetime
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..data.nifti import load_nifti, save_nifti
from ..models.registry import load_model
from ..train.checkpoint import load_params
from ..train.hd95 import brats_hd95, get_hausdorff
from ..train.metrics import segmentation_metrics
from ..train.metrics_brats import brats_dice
from ..train.trainer import PROFILES
from ..utils.logger import get_logger
from ..utils.runtime import validate_selected_modal
from .sliding_window import sliding_window_inference

CPU_STITCH_THRESHOLD = 500 * 500 * 1000  # voxels (reference parity)


def _resolve_checkpoint(args, train_config) -> str:
    if getattr(args, "checkpoint_dir", None):
        ckpt_dir = args.checkpoint_dir
    else:
        index = (f"_{args.model_index}"
                 if getattr(args, "model_index", None) else "")
        date = args.train_date or datetime.now().strftime("%m_%d")
        ckpt_dir = os.path.join(train_config["save_path"],
                                args.dataset_name, args.model_name,
                                date + index)
    name = getattr(args, "checkpoint_index", "val_best") or "val_best"
    for suffix in (".ckpt", ".pth", ""):
        path = os.path.join(ckpt_dir, f"{name}{suffix}")
        if os.path.exists(path):
            return path
    raise FileNotFoundError(
        f"No checkpoint named {name}[.ckpt] under {ckpt_dir}")


def run_inference(args, train_config: dict, model_config: dict,
                  test_config: dict) -> pd.DataFrame:
    profile = PROFILES[args.dataset_name]
    # Multi-process (``--distributed``): every process runs the same
    # volumes; only process 0 logs and writes CSV/NIfTI artifacts.
    rank = jax.process_index()
    logger = get_logger(os.path.join(
        test_config.get("result_metric_path", "./result/metric"),
        f"test_{args.dataset_name}_{args.model_name}.log"), rank=rank)

    in_ch = model_config[args.model_name].get("in_ch", [1, 1])
    modal_index = validate_selected_modal(
        args.model_name, model_config,
        raw_modal_count=profile.raw_modal_count,
        select_modal=getattr(args, "select_modal", None))

    # Files: last 20% of the sorted list.
    from glob import glob
    patterns = {name: train_config["dataset_path"][args.dataset_name][k]
                for k, name in zip(profile.glob_keys,
                                   profile.modality_names)}
    label_glob = train_config["dataset_path"][args.dataset_name][
        "label_path"]
    groups = {k: sorted(glob(p)) for k, p in patterns.items()}
    labels = sorted(glob(label_glob))
    n = len(labels)
    lo = int((train_config["train_rate"] + train_config["val_rate"]) * n)
    test_idx = list(range(lo, n))
    if getattr(args, "specific_sample", None) is not None:
        test_idx = [lo + int(args.specific_sample)]

    # Model + params.
    model = load_model(args.model_name, model_config)
    patch_size = train_config["patch_size"][args.dataset_name]
    ckpt_path = _resolve_checkpoint(args, train_config)
    logger.info(f"Loading checkpoint {ckpt_path}")
    example = jnp.zeros(
        (1, *patch_size,
         sum(in_ch) if isinstance(in_ch, (list, tuple)) else in_ch),
        jnp.float32)
    variables = jax.jit(model.init, static_argnames="train")(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)}, example, train=True)
    params = load_params(ckpt_path, params_template=variables["params"])

    # (params, tiles) signature → the sliding window runs each volume as
    # one jitted program (params passed as arguments, not HLO constants).
    predictor = lambda p, t: model.apply({"params": p}, t, train=False)
    overlap = test_config.get("sliding_window", {}).get("overlap", 0.25)
    use_hd95 = bool(getattr(args, "use_hd95", 0))
    from ..parallel.mesh import parse_mesh_spec
    mesh = parse_mesh_spec(getattr(args, "mesh", None))
    if mesh is not None:
        logger.info(f"Sliding-window mesh: {dict(mesh.shape)}")

    rows: List[Dict] = []
    pred_dir = test_config.get("result_pred_path", "./result/prediction")
    for i in test_idx:
        t0 = time.time()
        vols = [load_nifti(groups[k][i])
                for k, on in zip(profile.modality_names, modal_index)
                if on]
        label_img = load_nifti(labels[i])
        label = label_img.data.astype(np.int32)
        x = np.stack([v.data.astype(np.float32) for v in vols], axis=-1)
        volume_name = os.path.basename(labels[i])

        big = int(np.prod(x.shape[:-1])) > CPU_STITCH_THRESHOLD
        logits = sliding_window_inference(
            jnp.asarray(x[None]), patch_size,
            sw_batch_size=getattr(args, "sw_batch_size", 4),
            predictor=predictor, overlap=overlap, mode="constant",
            cpu_accumulate=big, params=params, mesh=mesh)
        logits = np.asarray(logits[0])
        pred = np.argmax(logits, axis=-1).astype(np.int32)
        elapsed = time.time() - t0

        if getattr(args, "specific_sample", None) is not None:
            if rank != 0:
                continue
            os.makedirs(pred_dir, exist_ok=True)
            base = volume_name.replace(".nii.gz", "").replace(".nii", "")
            for (k, on), v in zip(
                    zip(profile.modality_names, modal_index), vols):
                if on:
                    save_nifti(os.path.join(pred_dir, f"{base}_{k}.nii.gz"),
                               v.data, v.spacing, v.affine)
            save_nifti(os.path.join(pred_dir, f"{base}_pred.nii.gz"),
                       pred.astype(np.int16), label_img.spacing,
                       label_img.affine)
            if not profile.binary_label:
                for rname, mask in (("et", pred == 3),
                                    ("tc", (pred == 1) | (pred == 3)),
                                    ("wt", pred != 0)):
                    save_nifti(
                        os.path.join(pred_dir, f"{base}_{rname}.nii.gz"),
                        mask.astype(np.int16), label_img.spacing,
                        label_img.affine)
            logger.info(f"Saved prediction for {volume_name}")
            continue

        spacing = label_img.spacing[:3]
        if profile.binary_label:
            lab = (label != 0).astype(np.int32)
            m = {k: float(v) for k, v in segmentation_metrics(
                jnp.asarray(lab[None]), jnp.asarray(pred[None])).items()}
            row = {"name": volume_name, **m, "time": elapsed}
            if use_hd95:
                row["hd95"] = get_hausdorff(lab, (pred != 0).astype(int),
                                            spacing)
            logger.info(
                f"{volume_name}: Dice {m['dice']:.4f} IoU {m['iou']:.4f} "
                f"({elapsed:.1f}s)")
        else:
            d = {k: float(v) for k, v in brats_dice(
                jnp.asarray(pred[None]), jnp.asarray(label[None])).items()}
            row = {"name": volume_name,
                   **{f"dice_{k}": v for k, v in d.items()},
                   "time": elapsed}
            if use_hd95:
                h = brats_hd95(pred, label, spacing)
                row.update({f"hd95_{k}": v for k, v in h.items()})
            logger.info(
                f"{volume_name}: Avg {d['avg']:.4f} ET {d['et']:.4f} "
                f"TC {d['tc']:.4f} WT {d['wt']:.4f} ({elapsed:.1f}s)")
        rows.append(row)

    df = pd.DataFrame(rows)
    if len(df) and rank == 0:
        metric_dir = test_config.get("result_metric_path",
                                     "./result/metric")
        os.makedirs(metric_dir, exist_ok=True)
        out_csv = os.path.join(
            metric_dir, f"{args.dataset_name}_{args.model_name}.csv")
        df.to_csv(out_csv, index=False)
        means = df.mean(numeric_only=True)
        logger.info("Mean metrics:\n" + means.to_string())
        logger.info(f"Wrote {out_csv}")
    return df
