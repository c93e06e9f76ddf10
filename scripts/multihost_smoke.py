"""One process of the 2-process CPU multi-host validation (VERDICT r1 item 3).

Launched (twice, as process 0 and 1) by tests/test_multihost.py. Each process
owns 4 virtual CPU devices; the global mesh is data=4 x tile=2 over 8 devices.
Drives the REAL CLI (`gsplat_tpu.cli.main`) end-to-end — the same command a pod
slice would run, plus --num_processes/--process_id/--coordinator_address.

usage: python scripts/multihost_smoke.py <pid> <nproc> <port> <scene> <out> [extra CLI flags...]

Extra flags are appended after the baseline set (argparse last-wins), so the
sharded-Gaussians variant is the same script plus `--shard_gaussians
--iterations 6 --densify_from_iter 1 ...` (tests/test_multihost.py).
"""

import os
import sys
from pathlib import Path

# 4 virtual devices per process in the 2-process run; 8 for the 1-process
# comparison run (same 8-device global mesh either way)
_NPROC = int(sys.argv[2]) if len(sys.argv) > 2 else 2
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={8 // _NPROC}"
)

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_platforms", "cpu")  # axon sitecustomize ignores the env var
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main() -> int:
    pid, nproc, port, scene, out = sys.argv[1:6]
    extra = sys.argv[6:]

    from gsplat_tpu.cli import main as cli_main

    sys.argv = [
        "gsplat-tpu",
        "--source_path", scene, "--model_path", out,
        "--iterations", "4", "--capacity", "64",
        "--pair_budget", "4096", "--chunk_size", "32", "--tile_size", "16",
        "--data_axis", "4", "--tile_axis", "2",
        "--num_processes", nproc, "--process_id", pid,
        "--coordinator_address", f"localhost:{port}",
        "--densify_from_iter", "100",
        "--test_iterations", "--save_iterations", "--quiet",
    ] + extra
    rc = cli_main()

    # post-conditions: the global runtime really was nproc processes over the
    # same 8-device mesh, and this process owns exactly its share of data rows
    assert jax.process_count() == int(nproc), jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert len(jax.local_devices()) == 8 // int(nproc)

    from gsplat_tpu.dist.mesh import local_data_rows, make_mesh

    mesh = make_mesh(data=4, tile=2)
    rows = local_data_rows(mesh)
    assert len(rows) == 4 // int(nproc), rows
    for d in rows:
        assert any(
            dev.process_index == jax.process_index()
            for dev in mesh.devices[d].ravel()
        )
    print(f"process {pid}: rows {rows} OK", flush=True)
    return rc


if __name__ == "__main__":
    sys.exit(main())
