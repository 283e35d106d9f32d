"""Cross-dataset generalization inference — port of the reference's
``utils/inference_extern_mri.py`` (C9b in SURVEY §2; a manual entry point,
not wired into run_test there either).

Evaluates checkpoints trained on one dataset against another dataset:
volumes are resampled to the training spacing (``Spacingd`` parity —
trilinear for images, nearest for labels) or z-score normalized for
MSD-style raw data (``NormalizeIntensityd`` parity), then run through the
standard sliding-window + metrics flow. Accepts a comma-separated list of
checkpoints (``inference_extern_mri.py:145``).
"""

from __future__ import annotations

import argparse
import json
import os
import time
from glob import glob

import numpy as np
from scipy import ndimage

import jax
import jax.numpy as jnp
import pandas as pd

from ..data.nifti import load_nifti
from ..models.registry import load_model
from ..train.checkpoint import load_params
from ..train.metrics import segmentation_metrics
from ..utils.logger import get_logger


def resample_to_spacing(vol: np.ndarray, spacing, target_spacing,
                        order: int) -> np.ndarray:
    factors = [s / t for s, t in zip(spacing, target_spacing)]
    if all(abs(f - 1.0) < 1e-3 for f in factors):
        return vol
    return ndimage.zoom(vol, factors, order=order, mode="nearest")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_name", required=True,
                        help="external dataset key in the train config")
    parser.add_argument("--train_dataset", required=True,
                        help="dataset the checkpoints were trained on")
    parser.add_argument("--model_name", required=True)
    parser.add_argument("--checkpoints", required=True,
                        help="comma-separated checkpoint paths")
    parser.add_argument("--train_config", required=True)
    parser.add_argument("--model_config", required=True)
    parser.add_argument("--test_config", required=True)
    parser.add_argument("--normalize_intensity", type=int, default=0,
                        help="1 = per-volume z-score (MSD2019 parity)")
    parser.add_argument("--sw_batch_size", type=int, default=4)
    args = parser.parse_args(argv)

    with open(args.train_config) as f:
        train_config = json.load(f)
    with open(args.model_config) as f:
        model_config = json.load(f)
    with open(args.test_config) as f:
        test_config = json.load(f)

    from ..infer.sliding_window import sliding_window_inference

    logger = get_logger(os.path.join(
        test_config.get("result_metric_path", "./result/metric"),
        f"extern_{args.dataset_name}_{args.model_name}.log"))

    ds_paths = train_config["dataset_path"][args.dataset_name]
    data_glob = ds_paths.get("data_path") or ds_paths.get("pet_path")
    label_glob = ds_paths["label_path"]
    images = sorted(glob(data_glob))
    labels = sorted(glob(label_glob))

    patch_size = train_config["patch_size"][args.train_dataset]
    target_spacing = train_config["spacing"][args.train_dataset]
    overlap = test_config.get("sliding_window", {}).get("overlap", 0.25)
    in_ch = model_config[args.model_name].get("in_ch", [1, 1])
    n_in = sum(in_ch) if isinstance(in_ch, (list, tuple)) else in_ch

    model = load_model(args.model_name, model_config)
    example = jnp.zeros((1, *patch_size, n_in), jnp.float32)
    variables = jax.jit(model.init, static_argnames="train")(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)}, example, train=True)

    all_rows = []
    # Stable fn object across checkpoints → the cached volume runner is
    # reused (params are runtime arguments, not baked into the program).
    predictor = lambda p, t: model.apply({"params": p}, t, train=False)
    for ckpt in args.checkpoints.split(","):
        ckpt = ckpt.strip()
        params = load_params(ckpt, params_template=variables["params"])
        logger.info(f"=== checkpoint {ckpt} ===")
        for img_f, lab_f in zip(images, labels):
            t0 = time.time()
            img = load_nifti(img_f)
            lab = load_nifti(lab_f)
            vol = img.data.astype(np.float32)
            labd = lab.data.astype(np.int32)
            if args.normalize_intensity:
                vol = (vol - vol.mean()) / max(float(vol.std()), 1e-8)
            else:
                vol = resample_to_spacing(vol, img.spacing[:3],
                                          target_spacing, order=1)
                labd = resample_to_spacing(labd, lab.spacing[:3],
                                           target_spacing, order=0)
            if vol.ndim == 3:
                x = np.repeat(vol[..., None], n_in, axis=-1)
            else:
                x = vol
            logits = sliding_window_inference(
                jnp.asarray(x[None]), patch_size, args.sw_batch_size,
                predictor, overlap=overlap, params=params)
            pred = np.argmax(np.asarray(logits[0]), axis=-1)
            m = {k: float(v) for k, v in segmentation_metrics(
                jnp.asarray((labd != 0).astype(np.int32)[None]),
                jnp.asarray((pred != 0).astype(np.int32)[None])).items()}
            row = {"checkpoint": os.path.basename(ckpt),
                   "name": os.path.basename(lab_f), **m,
                   "time": time.time() - t0}
            all_rows.append(row)
            logger.info(f"{row['name']}: dice {m['dice']:.4f}")

    df = pd.DataFrame(all_rows)
    out_dir = test_config.get("result_metric_path", "./result/metric")
    os.makedirs(out_dir, exist_ok=True)
    out_csv = os.path.join(
        out_dir, f"extern_{args.dataset_name}_{args.model_name}.csv")
    df.to_csv(out_csv, index=False)
    logger.info(f"Wrote {out_csv}")
    return df


if __name__ == "__main__":
    main()
