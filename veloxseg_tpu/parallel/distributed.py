"""Multi-host (multi-process) SPMD runtime initialization.

Real TPU pod slices beyond one host (v5e-16 and up) run one process per
host; JAX's runtime must be initialized before any backend use so every
process sees the GLOBAL device set and GSPMD collectives ride ICI across
hosts. The reference is single-process single-GPU (SURVEY §2.5) — this
is a TPU-native addition.

Data flow under multi-process (see ``train/trainer.py``): every process
builds the identical global batch (same files, same seed, same loader
order) and each device fetches exactly its shard via
``jax.make_array_from_callback``
(:func:`veloxseg_tpu.parallel.mesh.shard_host_batch`) — correct for any
mesh layout, including spatial sharding that splits a batch row across
hosts. Decode work is duplicated per host — simple and deterministic;
sharding the file list per host is the follow-up optimization for very
large datasets. Logging, TensorBoard and checkpoint writes happen on
process 0 only.
"""

from __future__ import annotations

from typing import Optional


def initialize_distributed(spec: Optional[str]) -> None:
    """Initialize the JAX distributed runtime from a CLI spec.

    - falsy → no-op (single-process).
    - ``"auto"`` → ``jax.distributed.initialize()`` with no arguments:
      on TPU pods the coordinator/process topology is auto-detected from
      the TPU metadata.
    - ``"coordinator=HOST:PORT,num_processes=N,process_id=I"`` →
      explicit cluster (manual launches; the CPU multi-process tests).

    Must be called before any JAX backend initialization. Idempotent:
    a second call in an already-initialized process is a no-op (e.g. a
    launcher initialized the runtime before invoking the CLI).
    """
    if not spec:
        return
    import jax

    try:
        from jax._src.distributed import global_state
        if getattr(global_state, "client", None) is not None:
            return  # a launcher already initialized this process
    except ImportError:  # pragma: no cover - jax internals moved
        pass
    kw = {}
    if spec != "auto":
        for part in spec.split(","):
            k, _, v = part.partition("=")
            k = k.strip()
            if k == "coordinator":
                kw["coordinator_address"] = v
            elif k in ("num_processes", "process_id"):
                kw[k] = int(v)
            else:
                raise ValueError(
                    f"bad --distributed spec {spec!r}; expected 'auto' or "
                    f"'coordinator=HOST:PORT,num_processes=N,"
                    f"process_id=I'")
    try:
        jax.distributed.initialize(**kw)
    except RuntimeError as e:
        if "already" not in str(e).lower():
            raise
