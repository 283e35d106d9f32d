"""``run_train.py`` CLI — flag parity with reference ``run_train.py:6-31``."""

from __future__ import annotations

import argparse
import json

SUPPORTED_DATASETS = ("AutoPETII", "Hecktor2022", "BraTS2021")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_name", type=str, required=True,
                        choices=SUPPORTED_DATASETS, help="dataset name")
    parser.add_argument("--model_name", type=str, required=True,
                        help="model name")
    parser.add_argument("--train_config", type=str, required=True,
                        help="train_config path")
    parser.add_argument("--model_config", type=str, required=True,
                        help="model_config path")
    parser.add_argument("--checkpoint_path", type=str, default=None,
                        help="checkpoint path")
    parser.add_argument("--gpu_id", type=str, default="0",
                        help="device id (kept for flag parity)")
    parser.add_argument("--num_workers", type=int, default=8,
                        help="number of workers for data loading")
    parser.add_argument("--model_index", type=str, default=None,
                        help="Markdown index of the model")
    parser.add_argument("--select_modal", type=int, default=None)
    parser.add_argument(
        "--mesh", type=str, default=None,
        help="SPMD device mesh: 'auto' or 'data=N[,spatial=M]'. Default: "
             "single-device. (TPU-native addition; the reference is "
             "single-GPU.)")
    parser.add_argument(
        "--distributed", type=str, default=None,
        help="multi-host runtime init: 'auto' (TPU pod auto-detection) or "
             "'coordinator=HOST:PORT,num_processes=N,process_id=I'. "
             "Combine with --mesh over the GLOBAL device set. "
             "(TPU-native addition.)")
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    if getattr(args, "distributed", None):
        # must run before any JAX backend use (trainer, mesh parsing)
        from ..parallel.distributed import initialize_distributed
        initialize_distributed(args.distributed)
    with open(args.train_config, "r", encoding="utf-8") as f:
        train_config = json.load(f)
    with open(args.model_config, "r", encoding="utf-8") as f:
        model_config = json.load(f)
    from ..train.trainer import run_train
    return run_train(args, train_config, model_config)


if __name__ == "__main__":
    main()
