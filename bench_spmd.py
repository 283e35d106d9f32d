"""SPMD (data-parallel) scaling overhead measurement (VERDICT r2 item 6).

Runs the full-depth sharded train step (``parallel/dryrun.py``) at a
FIXED global batch across mesh sizes 1/2/4/8 on the virtual CPU backend,
each in its own subprocess (the forced device count must be set before
jax initializes). On a shared-core host the total compute per step is
constant, so ideal SPMD is flat step time — the ratio vs the 1-device
step isolates GSPMD partitioning + collective overhead, which is the
only SPMD quantity measurable without real multi-chip hardware. The
reference has no distributed mode at all (SURVEY §2.5).

Run manually (not part of the driver bench):
    python bench_spmd.py [--batch B] [--devices 1 2 4 8]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys


def run_one(n: int, batch: int) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-m", "veloxseg_tpu.parallel.dryrun",
         str(n), str(batch), "--bench"],
        capture_output=True, text=True, env=env, timeout=3600,
        cwd=os.path.dirname(os.path.abspath(__file__)))
    if out.returncode != 0:
        raise RuntimeError(f"n={n} failed:\n{out.stderr[-2000:]}")
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    args = ap.parse_args()

    rows = []
    for n in args.devices:
        r = run_one(n, args.batch)
        rows.append(r)
        print(f"n={n} mesh={r['mesh']} step={r['step_ms']} ms "
              f"loss={r['loss']}", file=sys.stderr)

    base = rows[0]["step_ms"]
    table = [{**r, "overhead_vs_1dev": round(r["step_ms"] / base - 1, 3)}
             for r in rows]
    print(json.dumps({"global_batch": args.batch, "rows": table}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
