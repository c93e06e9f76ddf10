"""Hermetic test configuration: run everything on CPU with 8 virtual devices so
multi-chip sharding logic is exercised without TPU hardware (SURVEY.md §4 lesson).

Note: the axon sitecustomize calls jax.config.update("jax_platforms", "axon,cpu")
at interpreter start, which overrides the JAX_PLATFORMS env var — so we must win
the override race via jax.config, not the environment.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# persistent compilation cache: XLA-CPU compiles cost ~0.5s/op on this host, so
# cache EVERYTHING — repeated test runs then skip all recompiles.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

assert jax.default_backend() == "cpu", jax.default_backend()
