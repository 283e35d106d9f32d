"""Test configuration: run the suite on a virtual 8-device CPU mesh.

This environment pre-imports jax at interpreter startup (an axon
sitecustomize registers the tunneled TPU backend with
``JAX_PLATFORMS=axon``), so env vars set here are too late — the platform
must be overridden through ``jax.config`` after import. The test suite
must never touch the real chip: CPU only, 8 virtual devices (the standard
TPU-less way to exercise jit/shard_map code).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (must follow the env setup above)

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # older jax: the XLA_FLAGS path above covers it

# XLA's default matmul/conv precision is reduced (bf16-like) even on CPU
# in this build — conv outputs differ from true fp32 by ~1e-3 relative.
# Tests (numerical parity vs torch especially) need real fp32. Product
# perf paths are unaffected: they feed bf16 inputs explicitly.
jax.config.update("jax_default_matmul_precision", "highest")
