"""CLI entry point.

Reference: src/train.cpp:12-47 — parse args, print the four parameter groups,
append the final iteration to save_iterations, seed the RNG, enable anomaly
detection behind --detect_anomaly, call train(). Run as:

    python -m gsplat_tpu.cli --source_path <scene> --model_path <out> [--eval ...]
"""

from __future__ import annotations

import sys
from typing import List, Optional

import jax

from gsplat_tpu.config import parse_parameters, print_params
from gsplat_tpu.train.loop import initialize_random_seed, train


def main(argv: Optional[List[str]] = None) -> int:
    # persistent compilation cache: first-time kernel compiles take minutes on
    # TPU; every later run (or recompile-on-growth) hits the cache
    import os

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("GSPLAT_CACHE_DIR", "/tmp/jax_cache_gsplat"),
    )
    # GSPLAT_CACHE_MIN_SECS=0 lets cache probes persist sub-second CPU
    # compiles (scripts/cache_probe.py); default 1.0 skips trivial entries
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs",
        float(os.environ.get("GSPLAT_CACHE_MIN_SECS", "1.0")),
    )
    # GSPLAT_FORCE_PLATFORM=cpu forces the CPU backend even under the axon
    # sitecustomize (which overrides the JAX_PLATFORMS env var via a config
    # update, so the env var alone cannot) — used by scripts/cache_probe.py
    forced = os.environ.get("GSPLAT_FORCE_PLATFORM", "")
    if forced:
        jax.config.update("jax_platforms", forced)

    # source-line-independent Pallas kernel payloads: without this, editing
    # any file above a pallas_call in the call stack silently changes every
    # kernel-bearing executable's persistent cache key (gsplat_tpu/cache_keys)
    from gsplat_tpu.cache_keys import install_stable_kernel_keys

    install_stable_kernel_keys()

    model, opt, pipe, other, mesh = parse_parameters(argv)

    # multi-device runs: let XLA hide the grad all-reduce behind backward
    # (env flags — must be set before the first backend use)
    if mesh.data_axis * mesh.tile_axis > 1 or mesh.data_axis == -1:
        from gsplat_tpu.dist.mesh import enable_collective_overlap

        enable_collective_overlap()

    # multi-host bootstrap must precede any backend use (SURVEY.md §7 M6)
    if mesh.num_processes > 1 or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
        from gsplat_tpu.dist.mesh import initialize_distributed

        initialize_distributed(
            coordinator_address=mesh.coordinator_address or None,
            num_processes=mesh.num_processes or None,
            process_id=mesh.process_id if mesh.process_id >= 0 else None,
        )

    if jax.process_index() == 0:
        for p in (model, opt, pipe, other, mesh):
            print_params(p, out=sys.stdout)

    # reference src/train.cpp:30 — always save the final iteration
    if opt.iterations not in other.save_iterations:
        other.save_iterations.append(opt.iterations)

    initialize_random_seed(0)

    # reference src/train.cpp:39 — autograd anomaly mode -> NaN debugging in JAX
    if other.detect_anomaly:
        jax.config.update("jax_debug_nans", True)

    train(model, opt, pipe, other, mesh)
    print("Training complete.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
