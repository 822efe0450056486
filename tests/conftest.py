"""Test configuration: run all tests on a virtual 8-device CPU mesh so
kernels (interpret mode) and multi-chip shardings are testable without TPU
hardware.

The axon TPU plugin's sitecustomize force-sets JAX_PLATFORMS at interpreter
startup, so env setdefault is not enough — override the jax config directly
(before any backend is initialized)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Persistent compile cache: repeated test runs skip XLA compiles.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/deft_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
