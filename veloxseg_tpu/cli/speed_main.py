"""``speed_test.py`` CLI — protocol parity with reference ``speed_test.py``.

Per model: find the max batch size by doubling up to 16 (OOM-guarded),
warm up, then run a timed throughput loop in bf16 (the TPU analogue of the
reference's fp16 autocast), and report params + an XLA FLOPs estimate
(replacing thop). Like the reference's ``for device in [cuda, cpu]`` loop
(``speed_test.py:58-69``), ``--devices default,cpu`` benches each model on
the accelerator and then on host CPU (via ``jax.default_device`` — no
re-platforming needed); the default is accelerator-only because a full
17-model CPU sweep takes hours on a 1-core host.
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.benchmarking import median_rate

INPUT_SIZE = {
    "AutoPETII": (96, 96, 96, 2),
    "Hecktor2022": (128, 128, 64, 2),
    "BraTS2021": (96, 96, 96, 4),
}
T_TIMED = 12.0
MAX_BS = 16
SKIP = ()  # all implemented models run; reference skips HCMA-UNet/U-RWKV


def _cast(tree, dtype):
    return jax.tree_util.tree_map(
        lambda a: a.astype(dtype)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, tree)


def find_max_batch_size(fwd, params, input_shape) -> int:
    max_bs, bs = 0, 1
    while bs <= MAX_BS:
        try:
            x = jnp.zeros((bs, *input_shape), jnp.bfloat16)
            jax.block_until_ready(fwd(params, x))
            max_bs = bs
            bs *= 2
        except Exception:
            break
    return max_bs


def bench_model(name: str, model_config: dict, input_shape,
                use_bf16: bool = True, device=None):
    if device is not None:
        with jax.default_device(device):
            return bench_model(name, model_config, input_shape, use_bf16)
    from ..models.registry import load_model
    model = load_model(name, model_config)
    x1 = jnp.zeros((1, *input_shape), jnp.float32)
    variables = jax.jit(model.init, static_argnames="train")(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)}, x1, train=False)
    params = variables["params"]
    n_params = sum(int(np.prod(v.shape))
                   for v in jax.tree_util.tree_leaves(params))
    if use_bf16:
        params = _cast(params, jnp.bfloat16)

    @jax.jit
    def fwd(p, x):
        return model.apply({"params": p}, x, train=False)

    bs = find_max_batch_size(fwd, params, input_shape)
    if bs == 0:
        print(f"{name}: does not fit at batch 1")
        return None
    x = jax.random.normal(jax.random.PRNGKey(2), (bs, *input_shape),
                          jnp.bfloat16 if use_bf16 else jnp.float32)
    # fenced timing (window-final value fetch) — per-iteration
    # block_until_ready is NOT an execution barrier on the tunneled
    # backend; see veloxseg_tpu/utils/benchmarking.py.
    throughput = median_rate(lambda: fwd(params, x), bs, windows=3,
                             seconds=T_TIMED / 3)

    flops = None
    try:
        lowered = jax.jit(fwd).lower(params, x1.astype(x.dtype))
        analysis = lowered.compile().cost_analysis()
        if analysis and "flops" in analysis:
            flops = float(analysis["flops"])
    except Exception:
        pass

    dev = next(iter(jnp.zeros(()).devices())).platform  # honors
    # jax.default_device, unlike jax.devices()[0]
    print(f"{name} {dev} {throughput:.2f} images/s @ batch size {bs}")
    print(f"Params {n_params / 1e6} M")
    if flops:
        # per-image FLOPs (thop analogue) + achieved rate for an MFU
        # cross-check by the reader
        print(f"FLOPS: {flops / 1e9} G")
        print(f"Achieved: {flops * throughput / 1e12:.2f} TFLOP/s")
    return {"model": name, "throughput": throughput, "batch_size": bs,
            "params": n_params, "flops": flops}


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, required=True,
                        choices=list(INPUT_SIZE))
    parser.add_argument("--model_list", type=str, default=None)
    parser.add_argument("--model_config", type=str, default=None,
                        help="model config JSON (defaults to config/"
                             "models_config_<dataset>.json)")
    parser.add_argument("--devices", type=str, default="default",
                        help="comma list of {default, cpu}: reference "
                             "speed_test benches [cuda, cpu]; pass "
                             "'default,cpu' to add the host-CPU pass")
    args = parser.parse_args(argv)

    cfg_path = args.model_config or \
        f"./config/models_config_{args.dataset.lower()}.json"
    with open(cfg_path, "r", encoding="utf-8") as f:
        config = json.load(f)

    if args.model_list:
        keys = [k.strip() for k in args.model_list.split(",")]
    else:
        keys = list(config.keys())

    wanted = [d.strip() for d in args.devices.split(",")]
    if wanted and all(d == "cpu" for d in wanted):
        # Pure-CPU run: re-platform BEFORE any backend init so the
        # accelerator backend is never touched (environments that pin
        # jax_platforms to the accelerator via jax.config — e.g. the
        # axon sitecustomize — would otherwise fail/hang the CPU pass
        # whenever the chip is unreachable).
        jax.config.update("jax_platforms", "cpu")
    devices = []
    for d in wanted:
        if d == "default":
            devices.append(None)
        elif d == "cpu":
            devices.append(jax.devices("cpu")[0])
        else:
            raise ValueError(f"unknown device {d!r} (use default/cpu)")

    from ..models.registry import available_models
    results = []
    for device in devices:
        for name in keys:
            if name in SKIP:
                continue
            if name not in available_models():
                print(f"{name}: not implemented yet, skipping")
                continue
            res = bench_model(name, config, INPUT_SIZE[args.dataset],
                              device=device)
            if res:
                res["device"] = ("default" if device is None
                                 else device.platform)
                results.append(res)
    return results


if __name__ == "__main__":
    main()
