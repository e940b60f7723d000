"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip TPU hardware is not available in CI; sharding tests run on
``xla_force_host_platform_device_count=8`` CPU devices instead, which
exercises the same mesh/collective code paths.  Must run before jax import.
"""

import os

# Disable the axon TPU plugin and use 8 virtual CPU devices.
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
jax.config.update("jax_compilation_cache_dir", "/tmp/parallax_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
