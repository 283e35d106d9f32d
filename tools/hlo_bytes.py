"""Static HBM-traffic audit of a compiled program (VERDICT r5 #1 aid).

Parses the optimized HLO of the flagship train step (or eval forward) and
attributes output-buffer bytes to top-level instructions, grouped by op
kind and (where present) source metadata. Writes ≈ sum of top-level
instruction output sizes; reads ≈ operand sizes — together a first-order
model of HBM traffic for a bandwidth-bound program.

Usage:
  python tools/hlo_bytes.py [--size 128] [--batch 16] [--mode train|eval]
                            [--top 40] [--platform cpu|tpu]

--platform cpu compiles for the host CPU backend (different fusion
decisions than TPU — use tpu when a chip is attached for faithful
attribution; cpu for a rough cut without chip time).
"""

from __future__ import annotations

import argparse
import collections
import re
import sys

import numpy as np

sys.path.insert(0, ".")

DTYPE_BYTES = {
    "f32": 4, "f16": 2, "bf16": 2, "f64": 8, "s32": 4, "u32": 4,
    "s8": 1, "u8": 1, "pred": 1, "s16": 2, "u16": 2, "s64": 8, "u64": 8,
}

SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(shape_str: str) -> int:
    """Total bytes of an HLO shape string (handles tuples)."""
    total = 0
    for dtype, dims in SHAPE_RE.findall(shape_str):
        if dtype not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dtype]
    return total


# Shape strings carry layout suffixes (``f32[256,256]{1,0:T(8,128)S(1)}``)
# and tuples contain spaces; match the shape non-greedily up to the first
# whitespace-preceded identifier directly followed by "(" (the op kind —
# identifiers inside layouts like ``T(8,128)`` are never space-preceded).
INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(.+?)\s+([\w\-]+)\(")
META_RE = re.compile(r'metadata=\{[^}]*op_name="([^"]+)"')


OPERANDS_RE = re.compile(r"%([\w.\-]+)")


def analyze(hlo_text: str, top: int, depth: int = 4):
    """Read+write HBM-traffic attribution of the entry computation.

    writes = each instruction's output bytes; reads = its operands'
    output bytes (looked up from their defining instructions). Fusion
    internals are invisible (correct: they live in registers/VMEM);
    fusion operands/outputs are the HBM boundary. Double-counts a
    buffer read by k consumers k times — which is what HBM sees.
    """
    by_kind = collections.Counter()
    by_meta = collections.Counter()
    rows = []
    # pass 1: output size of every entry instruction (incl. params/consts)
    out_bytes = {}
    entry_lines = []
    in_entry = False
    for line in hlo_text.splitlines():
        if line.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry and line.startswith("}"):
            in_entry = False
        if not in_entry:
            continue
        m = INSTR_RE.match(line)
        if not m:
            continue
        name, shape_str, kind = m.groups()
        out_bytes[name] = shape_bytes(shape_str)
        entry_lines.append((line, name, shape_str, kind))

    # S(1) = scoped memory (VMEM). async slice-starts / copy-starts with
    # an S(1) destination are HBM→VMEM operand prefetches: they read only
    # the transferred chunk from HBM and their consumers then read VMEM
    # (free). Results living in VMEM:
    in_vmem = set()

    def _tuple_shapes(s):
        """payload shapes of an async/copy tuple, layout-annotated."""
        return re.findall(r"(\w+\[[\d,]*\]\{[^}]*\})", s)

    for line, name, shape_str, kind in entry_lines:
        if kind in ("parameter", "constant", "tuple", "get-tuple-element",
                    "bitcast"):
            continue
        w = shape_bytes(shape_str)
        # operand list: text between the op-kind '(' and its matching ')'
        paren = line.find(kind + "(")
        args = line[paren + len(kind) + 1: line.find(")", paren)]
        ops = OPERANDS_RE.findall(args)
        if kind in ("async-start", "copy-start"):
            shapes = [s for s in _tuple_shapes(shape_str)
                      if not s.startswith(("s32", "u32", "pred"))]
            if kind == "async-start":
                # ((operand), chunk, s32): payload order = operand, chunk
                dest = shapes[-1] if shapes else shape_str
                src_b = shape_bytes(dest)      # slices read what they emit
            else:
                # (dest, src, u32)
                dest = shapes[0] if shapes else shape_str
                src_b = shape_bytes(shapes[1]) if len(shapes) > 1 else 0
            dest_vmem = "S(1)" in dest
            w = 0 if dest_vmem else shape_bytes(dest)
            r = src_b
            if dest_vmem:
                in_vmem.add(name)
        elif kind in ("async-done", "copy-done"):
            r = 0
            w = 0  # the transfer was already counted at the start op
            if "S(1)" in shape_str or any(o in in_vmem for o in ops):
                in_vmem.add(name)
        else:
            r = sum(0 if o in in_vmem else out_bytes.get(o, 0)
                    for o in ops)
        b = w + r
        if not b:
            continue
        by_kind[kind] += b
        mm = META_RE.search(line)
        meta = mm.group(1) if mm else ""
        meta_key = ("/".join(meta.split("/")[:depth]) if meta
                    else f"<{kind}>")
        by_meta[meta_key] += b
        rows.append((b, w, kind, name, meta))

    total = sum(by_kind.values())
    print(f"\ntotal HBM traffic (reads+writes): {total / 1e9:.2f} GB")
    print("\n-- by op kind --")
    for kind, b in by_kind.most_common(15):
        print(f"{kind:28s} {b / 1e9:9.3f} GB  ({100 * b / total:5.1f}%)")
    print(f"\n-- by op_name prefix (top {top}) --")
    for meta, b in by_meta.most_common(top):
        print(f"{b / 1e9:9.3f} GB  {meta}")
    print(f"\n-- largest single instructions (top {top}) --")
    rows.sort(reverse=True)
    for b, w, kind, name, meta in rows[:top]:
        print(f"{b / 1e9:9.3f} GB (w {w / 1e9:6.3f})  {kind:18s} "
              f"{meta[:80]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--mode", default="train", choices=["train", "eval"])
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--platform", default="", choices=["", "cpu", "tpu"])
    args = ap.parse_args()

    if args.platform:
        import os
        os.environ.setdefault("JAX_PLATFORMS", args.platform)

    import jax
    import jax.numpy as jnp

    from veloxseg_tpu.core.config import VeloxSegConfig
    from veloxseg_tpu.nn.veloxseg import VeloxSeg

    S, B = args.size, args.batch
    cfg = VeloxSegConfig().replace(depths=(1, 1, 1, 1), input_size=(S,) * 3)
    if S % 3 != 0:
        cfg = cfg.replace(min_big_window_sizes=(
            (4, 4, 4), (8, 8, 8), (4, 4, 4), (4, 4, 4)))
    key = jax.random.PRNGKey(0)
    bf = jnp.bfloat16
    x = jnp.zeros((B, S, S, S, 2), bf)

    model = VeloxSeg(cfg, train_blocked_heads=True)
    variables = jax.jit(model.init, static_argnames="train")(
        {"params": key, "dropout": key}, x[:1], train=True)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(bf) if jnp.issubdtype(a.dtype, jnp.floating)
        else a, variables["params"])

    if args.mode == "eval":
        def fn(p, xx):
            return model.apply({"params": p}, xx, train=False)
        lowered = jax.jit(fn).lower(params, x)
    else:
        rng = np.random.default_rng(0)
        y = jnp.asarray(rng.standard_normal((B, S, S, S)) > 1.2, jnp.int32)
        from veloxseg_tpu.train.loss import CompositeLoss
        from veloxseg_tpu.train.optim import build_optimizer
        from veloxseg_tpu.train.train_state import (_train_step_body,
                                                    create_train_state)
        tcfg = {"deep_Loss_weight": [1, 1, 1, 1], "RC_Loss_weight": 0.5,
                "Feature_Loss_weight": 2.0}
        loss_obj = CompositeLoss("VeloxSeg", tcfg, num_modal=2,
                                 blocked_scale=cfg.patch_size,
                                 blocked_in_ch=cfg.in_ch)
        tx = build_optimizer("adamw", {"lr": 2.5e-4, "weight_decay": 0.01})
        state = create_train_state(model, variables["params"], tx)
        body = _train_step_body(loss_obj, compute_dtype=bf)
        lowered = jax.jit(body).lower(state, x, y, key)

    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if ca:
        print(f"cost_analysis: {ca.get('flops', 0) / 1e9:.1f} GF, "
              f"{ca.get('bytes accessed', 0) / 1e9:.2f} GB accessed")
    analyze(compiled.as_text(), args.top)


if __name__ == "__main__":
    main()
