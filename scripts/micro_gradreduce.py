"""Microbench: per-Gaussian gradient reduction candidates at contrib scale.

Current chain (render.py _rasterize_bwd fallback): 10-op sort by gid key +
(P,16) cumsum + searchsorted(method='sort') + S[ends] row gather + diff.
Candidate: ONE row-wise scatter-add of the d-rows into the (N,16) gradient
table (no sort, no boundary machinery) — order of addition per Gaussian is the
d-array order, which the saturation compaction preserves, so sat on/off stays
bit-identical.

MEASURED (v5e, round 4, P=1.6M contrib rows, N=1M): scatter-add loses 4x —
the XLA TPU row scatter-add prices at ~100 ns/row (serialized updates), vs
~6.5 ns/row for the row gather. chain = 42.0 ms isolated; scatter-add =
161-163 ms in every layout variant; the (16,P)->(P,16) relayout itself is
free (0.45 ms). The sort-based reduction stays; scatters remain banned from
the pair pipeline (round-1 lesson re-confirmed at 25x the unit cost).

    python scripts/micro_gradreduce.py [--p 1606656] [--n 1048577]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_micro")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from gsplat_tpu.cache_keys import install_stable_kernel_keys

install_stable_kernel_keys()  # line-number-independent kernel cache keys

import jax.numpy as jnp
import numpy as np

from microbench_ops import report, timeit  # noqa: E402  (same dir)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--p", type=int, default=1_606_656)
    ap.add_argument("--n", type=int, default=1_048_577)
    ns = ap.parse_args()
    P, N = ns.p, ns.n
    key = jax.random.PRNGKey(0)

    # d16 as the bwd kernel emits it: (16, P), row 9 = f32 gid key
    kk = jax.random.fold_in(key, 1)
    gid = jnp.sort(jax.random.randint(kk, (P,), 0, N - 1, jnp.int32))
    # shuffle lightly so keys are not fully sorted (tile order != gid order)
    gid = jax.random.permutation(jax.random.fold_in(key, 2), gid)
    d16 = jax.random.normal(key, (16, P), jnp.float32)
    d16 = d16.at[9].set(gid.astype(jnp.float32))

    # (a) current chain
    def chain(d_t):
        sorted_ops = jax.lax.sort(
            (d_t[9],) + tuple(d_t[i] for i in range(9)), num_keys=1,
            is_stable=False,
        )
        key_s = sorted_ops[0]
        d_sorted = jnp.stack(sorted_ops[1:] + 7 * (jnp.zeros_like(key_s),), axis=1)
        S = jnp.concatenate(
            [jnp.zeros((1, 16), d_sorted.dtype), jnp.cumsum(d_sorted, axis=0)],
            axis=0,
        )
        ends = jnp.searchsorted(
            key_s, jnp.arange(1, N, dtype=jnp.int32).astype(jnp.float32),
            side="left", method="sort",
        )
        T_b = S[ends][:, :9]
        return T_b - jnp.concatenate(
            [jnp.zeros((1, 9), T_b.dtype), T_b[:-1]], axis=0
        )

    ms = timeit(jax.jit(chain), d16, iters=3)
    report("chain_sort_cumsum_searchsorted", ms, P * 16 * 4)

    # (b) scatter-add of transposed rows
    def scat_t(d_t):
        g = d_t[9].astype(jnp.int32)
        rows = d_t[:9].T  # (P, 9) relayout
        return jnp.zeros((N - 1, 9), jnp.float32).at[g].add(rows, mode="drop")

    ms = timeit(jax.jit(scat_t), d16, iters=3)
    report("scatter_add_rows_with_transpose", ms, P * 9 * 4 * 2)

    # (c) scatter-add, 16-wide rows (table layout the gather path prefers)
    def scat16(d_t):
        g = d_t[9].astype(jnp.int32)
        rows = d_t.T  # (P, 16)
        return jnp.zeros((N - 1, 16), jnp.float32).at[g].add(rows, mode="drop")

    ms = timeit(jax.jit(scat16), d16, iters=3)
    report("scatter_add_rows16_with_transpose", ms, P * 16 * 4 * 2)

    # (d) scatter-add from already-(P,16) rows (transpose cost isolated)
    d_r = jnp.asarray(np.asarray(d16).T)
    gid_i = d_r[:, 9].astype(jnp.int32)

    def scat_pre(rows, g):
        return jnp.zeros((N - 1, 16), jnp.float32).at[g].add(rows, mode="drop")

    ms = timeit(jax.jit(scat_pre), d_r, gid_i, iters=3)
    report("scatter_add_rows16_pretransposed", ms, P * 16 * 4 * 2)

    # (e) the transpose alone
    ms = timeit(jax.jit(lambda d_t: d_t.T + 0.0), d16, iters=3)
    report("transpose_16xP", ms, P * 16 * 4 * 2)


if __name__ == "__main__":
    main()
