"""Pallas TPU boundary-position kernel: per-Gaussian segment ends in a sorted
key row.

The gradient reduction (render._rasterize_bwd) needs, for every Gaussian g,
the position of its segment end in the gid-sorted d-rows:
ends[g] = #{keys < g+1}. XLA's `searchsorted(method='sort')` computes that by
sorting the N queries INTO the P keys — 2.65M extra sorted rows whose prep
fusion + sort cost ~18 ms at the sparse bench (round-4 profile: 12.3 + 5.8).

This kernel counts instead: a coarse searchsorted of the nb+1 1024-Gaussian
block boundaries (~1k queries — tiny) brackets each block's key window
[qb[k], qb[k+1]); the kernel sweeps that window in 1024-key chunks and
counts, per gid on sublanes, keys <= gid on the VPU (keys are exact
integer-valued f32, render.py's 2^24 guard). Every key is swept by exactly
one block, so total work is P x GB outer compares (~1 ms VPU-class at the
sparse bench) plus one sequential DMA pass over the key row.

Chunks are DMA'd as aligned supersets of the window; rows outside it are
excluded BY VALUE (their keys lie outside [k*GB, (k+1)*GB)), so no index
masking is needed — the pad rows carry KEY_INVALID-class values and never
match. Same windowed-count family as the deleted segred kernel, but with a
single 1-D input — probing (and dodging) the XLA memory-space cascade its
(16, P) stacked operand triggered (BASELINE.md rounds 3-4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

GB = int(_os.environ.get("GSPLAT_ENDS_GB", "1024"))  # gids per grid block
# keys per DMA chunk (PC // 128 rows of 128 lanes). The sweep is DMA-count
# bound at the sparse bench (the per-chunk compare work is ~1 ms VPU-class);
# larger chunks amortize the per-DMA latency — env lever for on-chip A/B.
PC = int(_os.environ.get("GSPLAT_ENDS_PC", "1024"))
assert PC % 128 == 0 and PC > 0, PC
_PAD_KEY = float(1 << 30)  # never matches any gid's value window


def _ends_kernel(qb_ref, keys_hbm, out_ref, buf, sems):
    k = pl.program_id(0)
    lo = qb_ref[k]
    hi = qb_ref[k + 1]
    a_key = (lo // PC) * PC
    nch = (hi - a_key + PC - 1) // PC
    a_row = pl.multiple_of(a_key // 128, PC // 128)

    def dma(slot, j):
        return pltpu.make_async_copy(
            keys_hbm.at[pl.ds(a_row + j * (PC // 128), PC // 128), :],
            buf.at[slot], sems.at[slot],
        )

    @pl.when(nch > 0)
    def _():
        dma(0, 0).start()

    g0 = (k * GB).astype(jnp.float32)
    gcol = g0 + jax.lax.broadcasted_iota(jnp.int32, (GB, 1), 0).astype(
        jnp.float32
    )

    def body(j, acc):
        slot = j % 2

        @pl.when(j + 1 < nch)
        def _():
            dma((j + 1) % 2, j + 1).start()

        dma(slot, j).wait()
        for r in range(PC // 128):
            keys_r = buf[slot][r:r + 1, :]                     # (1, 128)
            # value mask: only this block's window keys satisfy
            # g0 <= key <= gid (outer compare: gids on sublanes, keys on
            # lanes)
            hit = (keys_r >= g0) & (keys_r <= gcol)            # (GB, 128)
            acc = acc + jnp.sum(hit.astype(jnp.int32), axis=1, keepdims=True)
        return acc

    acc = jax.lax.fori_loop(0, nch, body, jnp.zeros((GB, 1), jnp.int32))
    out_ref[...] = qb_ref[k] + acc


def segment_ends(key_s: jnp.ndarray, n: int, *,
                 interpret: bool = False) -> jnp.ndarray:
    """key_s (P,) f32 sorted integer-valued gid keys -> (n,) int32 positions:
    ends[g] = #{key_s < g+1}. n must be a multiple of GB, P of 128."""
    (p,) = key_s.shape
    assert n % GB == 0 and p % 128 == 0, (n, p)
    nb = n // GB
    qb = jnp.searchsorted(
        key_s, (jnp.arange(nb + 1, dtype=jnp.int32) * GB).astype(jnp.float32),
        side="left",
    ).astype(jnp.int32)

    # pad so the last window's aligned chunk sweep stays in bounds; pad rows
    # never match any gid window by value
    keys2d = jnp.pad(
        key_s.reshape(p // 128, 128), ((0, PC // 128), (0, 0)),
        constant_values=_PAD_KEY,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((GB, 1), lambda k, *_: (k, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, PC // 128, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _ends_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(qb, keys2d)
    return out.reshape(n)
