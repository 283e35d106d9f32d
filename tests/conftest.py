"""Test configuration: run the suite on a virtual 8-device CPU mesh.

This is the standard TPU-less way to exercise jit/shard_map code; the real
TPU is reserved for benchmarks (first compile there is slow).
"""

import os

# Force CPU even if the environment points JAX at a (tunneled) TPU — the
# test suite must never contend with benchmark runs for the real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
