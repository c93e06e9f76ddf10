"""Hermetic test configuration: run everything on CPU with 8 virtual devices so
multi-chip sharding logic is exercised without TPU hardware (SURVEY.md §4 lesson)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# persistent compilation cache: repeated test runs skip recompiles
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
