"""``run_export.py`` CLI — serialize a trained model for serving.

No reference analogue (the reference ships the framework + ``.pth`` to
serve a model); this produces one self-contained artifact:
shape-polymorphic StableHLO of the eval forward + the checkpoint's
params + metadata. Load with
:func:`veloxseg_tpu.infer.export.load_artifact` —
``exported.call(params, volume_batch)`` — no model code needed.
"""

from __future__ import annotations

import argparse
import json
import os

SUPPORTED_DATASETS = ("AutoPETII", "Hecktor2022", "BraTS2021")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_name", type=str, required=True,
                        choices=SUPPORTED_DATASETS)
    parser.add_argument("--model_name", type=str, required=True)
    parser.add_argument("--model_config", type=str, required=True)
    parser.add_argument("--train_config", type=str, required=True)
    parser.add_argument("--train_date", type=str, default=None)
    parser.add_argument("--model_index", type=str, default=None)
    parser.add_argument("--checkpoint_dir", type=str, default=None)
    parser.add_argument("--checkpoint_index", type=str, default="val_best")
    parser.add_argument("--output", type=str, required=True,
                        help="artifact file to write (e.g. model.vsx)")
    parser.add_argument(
        "--platforms", type=str, default=None,
        help="comma-separated lowering platforms (e.g. 'tpu,cpu'); "
             "default: current backend")
    parser.add_argument(
        "--batch", type=int, default=None,
        help="pin the batch dimension; default: symbolic (any batch)")
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    with open(args.train_config, "r", encoding="utf-8") as f:
        train_config = json.load(f)
    with open(args.model_config, "r", encoding="utf-8") as f:
        model_config = json.load(f)

    import jax
    import jax.numpy as jnp

    from ..infer.driver import _resolve_checkpoint
    from ..infer.export import export_eval, save_artifact
    from ..models.registry import load_model
    from ..train.checkpoint import load_params

    model = load_model(args.model_name, model_config)
    patch_size = train_config["patch_size"][args.dataset_name]
    mcfg = model_config[args.model_name]
    in_ch = mcfg.get("in_ch", [1, 1])
    channels = sum(in_ch) if isinstance(in_ch, (list, tuple)) else in_ch

    ckpt_path = _resolve_checkpoint(args, train_config)
    example = jnp.zeros((1, *patch_size, channels), jnp.float32)
    variables = jax.jit(model.init, static_argnames="train")(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)}, example, train=True)
    params = load_params(ckpt_path, params_template=variables["params"])

    platforms = (tuple(p.strip() for p in args.platforms.split(","))
                 if args.platforms else None)
    exported = export_eval(model, params, patch_size, channels,
                           platforms=platforms, batch=args.batch)
    save_artifact(args.output, exported, params, metadata={
        "model_name": args.model_name,
        "dataset_name": args.dataset_name,
        "patch_size": list(patch_size),
        "channels": channels,
        "checkpoint": os.path.abspath(ckpt_path),
        "platforms": list(exported.platforms),
    })
    print(f"wrote {args.output} "
          f"({os.path.getsize(args.output) / 1e6:.1f} MB, "
          f"platforms={list(exported.platforms)})")
    return args.output


if __name__ == "__main__":
    main()
