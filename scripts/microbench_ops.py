"""Microbenchmark the pair-proportional XLA ops of the dense render step.

Times each primitive in isolation using DEVICE-SIDE xplane traces (on the
axon-tunneled backend jax.block_until_ready returns before device work
completes — a 1.1-TFLOP matmul "finished" in 38 us of wall time — so wall
clocks under-measure and queued buffers OOM; device event sums are immune).

    python scripts/microbench_ops.py [--pairs 26214400] [--n 1000000]
Prints one JSON line per op: {"op": ..., "ms": ..., "gb": ..., "gbps": ...}.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

TRACE_DIR = "/tmp/gsplat_microbench_trace"


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    # scalar INDEX, not ravel(): reshaping a lane-padded (P, 16) TPU array to
    # 1D materializes a relayout copy (~8x the logical bytes) and OOMs
    np.asarray(jax.device_get(leaf[(0,) * leaf.ndim]))


def device_ms(trace_dir: str) -> float:
    """Total device-side event time (ms) across the TPU plane's op lines."""
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    paths = glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb")
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(sorted(paths)[-1], "rb").read())
    total_ps = 0
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        md = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = md[ev.metadata_id].name if ev.metadata_id in md else ""
                total_ps += ev.duration_ps
    return total_ps / 1e9


def timeit(fn, *args, iters: int = 4) -> float:
    out = fn(*args)  # compile
    _sync(out)
    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(iters):
        out = fn(*args)
        _sync(out)  # per-iter sync bounds in-flight buffers AND fences the trace
    jax.profiler.stop_trace()
    return device_ms(TRACE_DIR) / iters


def report(op, ms, nbytes):
    gb = nbytes / 1e9
    print(json.dumps({"op": op, "ms": round(ms, 2), "gb": round(gb, 3),
                      "gbps": round(gb / (ms / 1e3), 1)}), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=26_214_400)  # dense kept budget
    ap.add_argument("--slots", type=int, default=41_943_040)  # dense expansion
    ap.add_argument("--n", type=int, default=1_000_000)
    args = ap.parse_args()
    P, S, N = args.pairs, args.slots, args.n
    key = jax.random.PRNGKey(0)

    # 1. f32 cumsum (P, 16) axis 0 — the gradient-reduction S table
    x16 = jax.random.normal(key, (P, 16), jnp.float32)
    ms = timeit(jax.jit(lambda a: jnp.cumsum(a, axis=0)), x16)
    report("cumsum_f32_Px16_axis0", ms, 2 * P * 16 * 4)

    # 1b. same, transposed layout (16, P) axis 1
    x16t = jnp.asarray(x16.T)
    ms = timeit(jax.jit(lambda a: jnp.cumsum(a, axis=1)), x16t)
    report("cumsum_f32_16xP_axis1", ms, 2 * P * 16 * 4)
    del x16t

    # 2. i32 cumsum (S, 10) axis 0 — the B2 expansion telescoping
    xi = jax.random.randint(key, (S, 10), 0, 100, jnp.int32)
    ms = timeit(jax.jit(lambda a: jnp.cumsum(a, axis=0)), xi)
    report("cumsum_i32_Sx10_axis0", ms, 2 * S * 10 * 4)
    del xi

    # 2b. single-column i32 cumsum at S (the marks -> gid_c scan)
    x1 = jax.random.randint(key, (S,), 0, 2, jnp.int32)
    ms = timeit(jax.jit(lambda a: jnp.cumsum(a)), x1)
    report("cumsum_i32_Sx1", ms, 2 * S * 4)
    del x1

    # 3. scatter-add of (N, 10) rows at sorted unique offsets into (S, 10)
    offs = jnp.sort(jax.random.randint(key, (N,), 0, S, jnp.int32))
    rows = jax.random.randint(key, (N, 10), 0, 100, jnp.int32)
    f = jax.jit(lambda o, r: jnp.zeros((S, 10), jnp.int32).at[o].add(r, mode="drop"))
    ms = timeit(f, offs, rows)
    report("scatter_add_Nx10_into_Sx10", ms, (S * 10 + N * 10) * 4)
    del offs, rows

    # 4. attr gather: P random rows from an (N, 16) table
    gid = jax.random.randint(key, (P,), 0, N, jnp.int32)
    tab = jax.random.normal(key, (N, 16), jnp.float32)
    ms = timeit(jax.jit(lambda t, g: t[g]), tab, gid)
    report("gather_P_rows_from_Nx16", ms, P * 16 * 4)
    del gid

    # 5. the 10-operand gradient sort at P
    ops10 = tuple(jax.random.normal(jax.random.fold_in(key, i), (P,), jnp.float32)
                  for i in range(10))
    f = jax.jit(lambda *a: jax.lax.sort(a, num_keys=1, is_stable=False))
    ms = timeit(f, *ops10, iters=2)
    report("sort_1key_10op_P", ms, 2 * P * 10 * 4)
    del ops10

    # 5b. key-only sort at P (lower bound of any sort-based reduction)
    kk = jax.random.normal(key, (P,), jnp.float32)
    f = jax.jit(lambda a: jax.lax.sort((a,), num_keys=1, is_stable=False))
    ms = timeit(f, kk)
    report("sort_1key_1op_P", ms, 2 * P * 4)
    del kk

    # 6. the 2-operand pair sort at S
    k2 = jax.random.randint(key, (S,), 0, 1 << 30, jnp.int32)
    v2 = jax.random.randint(key, (S,), 0, N, jnp.int32)
    f = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2, is_stable=False))
    ms = timeit(f, k2, v2, iters=2)
    report("sort_2key_2op_S", ms, 2 * S * 8)
    del k2, v2

    # 7. boundary gather: N+1 rows from the (P, 16) cumsum table
    cum = jnp.sort(jax.random.randint(key, (N + 1,), 0, P, jnp.int32))
    ms = timeit(jax.jit(lambda t, c: t[c]), x16, cum)
    report("boundary_gather_N_from_Px16", ms, N * 16 * 4)


if __name__ == "__main__":
    main()
