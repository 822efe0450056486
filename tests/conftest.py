"""Test configuration: run all tests on a virtual 8-device CPU mesh so
kernels (interpret mode) and multi-chip shardings are testable without TPU
hardware."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Persistent compile cache: repeated test runs skip XLA compiles.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/deft_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.2")
