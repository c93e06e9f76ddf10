"""Microbenchmarks for the pair-gradient reduction path (round-2 perf work).

All variants MATERIALIZE their outputs (an earlier sum-only version let XLA
collapse the data movement and reported fantasy numbers). Times on the chip:

  A. current: scatter-build inv_e + row-gather of (P,16) cotangents
  B. sort by gid key with 9 f32 payload columns (permutation-by-sort)
  C. cumsum + S[cum] boundary-diff (16 cols) — the segment reduce
  C9. same at 9 cols
  E. the (tile,depth) binning sort (4 operands) for scale
  F. attrs[gid] row-gather (the fwd expansion gather)

Usage: python scripts/micro_reduce.py [--p 2621440] [--n 1000000]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from gsplat_tpu.cache_keys import install_stable_kernel_keys

install_stable_kernel_keys()  # line-number-independent kernel cache keys

import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, iters=5):
    fn = jax.jit(fn)
    jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        jax.block_until_ready(fn(*args))
        best = min(best, time.time() - t0)
    print(f"{name:45s} {best * 1e3:9.2f} ms", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--p", type=int, default=5 << 19)     # padded budget ~2.6M
    ap.add_argument("--live", type=int, default=2_100_000)
    ap.add_argument("--n", type=int, default=1_000_000)
    ns = ap.parse_args()
    P, L, N = ns.p, ns.live, ns.n

    rng = np.random.default_rng(0)
    perm = rng.permutation(P).astype(np.int32)
    eid = np.full(P, L, np.int32)
    eid[perm[:L]] = np.arange(L, dtype=np.int32)
    d_t = rng.normal(size=(16, P)).astype(np.float32)
    counts = rng.multinomial(L, np.ones(N) / N).astype(np.int32)
    cum = np.cumsum(counts).astype(np.int32)
    gid_key = np.where(eid < L, rng.integers(0, N, P), 1 << 30).astype(np.int32)

    eid_j = jnp.asarray(eid)
    d_t_j = jnp.asarray(d_t)
    cum_j = jnp.asarray(cum)
    key_j = jnp.asarray(gid_key)
    gid_pad = jnp.asarray(rng.integers(0, N, size=P).astype(np.int32))
    attrs = jnp.asarray(rng.normal(size=(N + 1, 16)).astype(np.float32))

    def variant_a(d_t, eid):
        inv_e = jnp.full((L,), P, jnp.int32).at[eid].set(
            jnp.arange(P, dtype=jnp.int32), mode="drop", unique_indices=True
        )
        return jnp.concatenate([d_t.T, jnp.zeros((1, 16), d_t.dtype)], axis=0)[inv_e]

    def variant_b(d_t, key):
        ops = (key,) + tuple(d_t[i] for i in range(9))
        return jax.lax.sort(ops, num_keys=1, is_stable=False)[1:]

    def variant_c(d_t, cum):
        S = jnp.concatenate(
            [jnp.zeros((1, 16), d_t.dtype), jnp.cumsum(d_t.T[:L], axis=0)], axis=0
        )
        T_b = S[cum]
        return T_b - jnp.concatenate([jnp.zeros((1, 16)), T_b[:-1]], axis=0)

    def variant_c9(d_t, cum):
        S = jnp.concatenate(
            [jnp.zeros((1, 9), d_t.dtype), jnp.cumsum(d_t[:9].T[:L], axis=0)], axis=0
        )
        T_b = S[cum]
        return T_b - jnp.concatenate([jnp.zeros((1, 9)), T_b[:-1]], axis=0)

    def variant_e(eid):
        k1 = jnp.asarray(rng.integers(0, 2040, P).astype(np.int32))
        k2 = jnp.asarray(rng.normal(size=P).astype(np.float32))
        return jax.lax.sort((k1, k2, eid, eid), num_keys=2, is_stable=True)

    def variant_f(attrs, gid):
        return attrs[gid]

    def variant_f_t(attrs, gid):
        return attrs[gid].T

    timeit("A inv_e scatter + row-gather (current)", variant_a, d_t_j, eid_j)
    timeit("B sort gid key + 9 payload cols", variant_b, d_t_j, key_j)
    timeit("C cumsum + S[cum] boundary (16 cols)", variant_c, d_t_j, cum_j)
    timeit("C9 cumsum + S[cum] boundary (9 cols)", variant_c9, d_t_j, cum_j)
    timeit("E (tile,depth) 2-key sort, 2 payloads", variant_e, eid_j)
    timeit("F attrs[gid] row-gather (fwd)", variant_f, attrs, gid_pad)
    timeit("F' attrs[gid].T (fwd, transposed out)", variant_f_t, attrs, gid_pad)


if __name__ == "__main__":
    main()
