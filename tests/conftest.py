"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware (the driver
separately dry-runs the multichip path)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the env presets axon (real TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's sitecustomize registers the axon TPU plugin at
# interpreter start and captures JAX_PLATFORMS before conftest runs, so the
# env var alone doesn't stick — override through the config API.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: the kernel while_loops are compile-heavy;
# cache across test runs to keep the suite fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
