"""Device mesh & process bootstrap.

The reference has zero parallelism (SURVEY.md §2.2: no DP/TP/PP, no NCCL/MPI — the
ip/port flags are for upstream's GUI viewer). This layer is therefore designed
TPU-first rather than ported:

- axes: ("data", "tile") — camera-batch data parallelism over `data`, intra-image
  spatial (tile-band) parallelism over `tile`. 3DGS has no sequence dimension; the
  scaling axes are cameras x pixels (SURVEY.md §5 'long-context' row).
- collectives: XLA inserts psum/all_gather over ICI from shard_map transposes —
  no hand-written communication backend (SURVEY.md §2.2 table).
- multi-host: jax.distributed.initialize() over DCN, one process per host, with
  per-host data loading feeding jax.make_array_from_process_local_data.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
TILE_AXIS = "tile"


def enable_collective_overlap() -> None:
    """Ask XLA to overlap the DP gradient all-reduce with backward compute.

    The SPMD step emits its collectives through shard_map transposes; whether
    they hide behind the backward Pallas kernels is the scheduler's call. These
    flags turn on XLA:TPU's latency-hiding scheduler and async collective
    fusion (SURVEY.md §7 hard part 5, BASELINE north star 'grad allreduce
    overlapped with backward'). Harmless single-chip (no collectives to
    schedule); must run before the first backend use to take effect. Real
    overlap can only be profiled on multi-chip hardware, which CI does not
    have — the multichip dryrun validates compile+execute, not timing.
    """
    flags = (
        "--xla_tpu_enable_latency_hiding_scheduler=true",
        "--xla_tpu_enable_async_collective_fusion=true",
        "--xla_tpu_enable_async_collective_fusion_fuse_all_gather=true",
    )
    # LIBTPU_INIT_ARGS, not XLA_FLAGS: the CPU/GPU XLA flag parser aborts the
    # process on unknown --xla_tpu_* flags, while libtpu alone reads this var.
    cur = os.environ.get("LIBTPU_INIT_ARGS", "")
    present = {t.split("=")[0] for t in cur.split()}
    add = " ".join(f for f in flags if f.split("=")[0] not in present)
    if add:
        os.environ["LIBTPU_INIT_ARGS"] = (cur + " " + add).strip()


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bootstrap (DCN). No-op for single-process runs; on TPU pods with
    the standard environment, jax.distributed.initialize() autodetects."""
    enable_collective_overlap()
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def make_mesh(
    data: int = -1, tile: int = 1, devices=None
) -> Mesh:
    """Build the ("data","tile") mesh. data=-1 consumes all remaining devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data == -1:
        assert n % tile == 0, (n, tile)
        data = n // tile
    assert data * tile == n, f"mesh {data}x{tile} != {n} devices"
    arr = np.asarray(devices).reshape(data, tile)
    return Mesh(arr, (DATA_AXIS, TILE_AXIS))


def local_data_rows(mesh: Mesh) -> list:
    """Data-axis rows whose devices include at least one addressable device of
    THIS process — the batch rows a multi-host process must supply to
    jax.make_array_from_process_local_data (single-process: all rows)."""
    pid = jax.process_index()
    rows = []
    for d in range(mesh.devices.shape[0]):
        if any(dev.process_index == pid for dev in np.ravel(mesh.devices[d])):
            rows.append(d)
    return rows


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over the camera batch."""
    return NamedSharding(mesh, P(DATA_AXIS))
