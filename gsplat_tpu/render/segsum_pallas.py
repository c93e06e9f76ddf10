"""Pallas TPU per-Gaussian segment-sum kernel over gid-sorted gradient rows.

The gradient reduction (render._rasterize_bwd) turns the sorted d-rows into
per-Gaussian sums. The XLA chain for that — 16-wide stack + cumsum, the
boundary-ends kernel (bounds_pallas), an S[ends] row gather, and an adjacent
difference — costs ~18 ms at the sparse bench (round-4 profile: ends 9.7 +
S[ends] 6.5 + cumsum/diff ~2). This kernel emits the (n, 16) per-Gaussian sums
DIRECTLY from the 10 sorted rows in one pass.

Same windowed-bracket family as bounds_pallas.segment_ends: a coarse
searchsorted of the nb+1 GB-Gaussian block boundaries brackets each program's
key window [qb[k], qb[k+1]); the program sweeps that window in PC-key chunks.
Per 128-key row it forms the equality outer compare hit[g, l] =
(key[l] == g0 + g) — gids on sublanes, keys on lanes — and accumulates
acc += hit @ vals_t on the MXU, where vals_t (128, 16) is the row's nine
gradient values transposed into columns by a one-hot matmul. Keys are exact
integer-valued f32 (render.py's 2^24 guard), so float equality is exact; rows
outside the window (aligned-superset pads, KEY_INVALID tails) match no gid by
VALUE, so no index masking is needed.

Precision: vals split into 3 bf16 terms (~2^-24 input-error class, the same
split-matmul scheme as raster_pallas); the transpose of each bf16 term is
exact, and hit is 0/1 (bf16-exact), so the accumulation is 3 one-pass MXU
matmuls per term-row with f32 accumulators.

The 10 operands stay SEPARATE 1-D rows (as lax.sort produces them): the
round-2/3 segred kernel showed a (16, P) stacked operand flips XLA
memory-space assignment into staging f32[N] buffers through VMEM (+170
ms/step); bounds/compact landed cascade-free with narrow operands
(BASELINE.md rounds 3-4).
"""

from __future__ import annotations

import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GB = int(_os.environ.get("GSPLAT_SUMS_GB", "1024"))  # gids per grid block
PC = 1024          # keys per DMA chunk (PC // 128 rows of 128 lanes)
N_VALS = 9         # d-rows carrying gradients (render.N_DCOLS)
OUT_DIM = 16       # output columns (9 sums + zero padding = attr row layout)
_PAD_KEY = float(1 << 30)  # outside every gid window; never equal to a gid


def _split3(a):
    """f32 -> 3 bf16 terms summing to a (~2^-24 residual)."""
    h0 = a.astype(jnp.bfloat16)
    r1 = a - h0.astype(jnp.float32)
    h1 = r1.astype(jnp.bfloat16)
    h2 = (r1 - h1.astype(jnp.float32)).astype(jnp.bfloat16)
    return (h0, h1, h2)


def _dot1(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


def _sums_kernel(qb_ref, keys_hbm, *rest):
    vals_hbm = rest[:N_VALS]
    out_ref = rest[N_VALS]
    kbuf = rest[N_VALS + 1]
    vbufs = rest[N_VALS + 2:N_VALS + 2 + N_VALS]
    sems = rest[N_VALS + 2 + N_VALS]

    k = pl.program_id(0)
    lo = qb_ref[k]
    hi = qb_ref[k + 1]
    a_key = (lo // PC) * PC
    nch = (hi - a_key + PC - 1) // PC
    a_row = pl.multiple_of(a_key // 128, PC // 128)

    def dma(slot, j):
        rows = pl.ds(a_row + j * (PC // 128), PC // 128)
        cps = [pltpu.make_async_copy(keys_hbm.at[rows, :], kbuf.at[slot],
                                     sems.at[slot, 0])]
        for i in range(N_VALS):
            cps.append(pltpu.make_async_copy(
                vals_hbm[i].at[rows, :], vbufs[i].at[slot], sems.at[slot, 1 + i]
            ))
        return cps

    @pl.when(nch > 0)
    def _():
        for c in dma(0, 0):
            c.start()

    g0 = (k * GB).astype(jnp.float32)
    gcol = g0 + jax.lax.broadcasted_iota(jnp.int32, (GB, 1), 0).astype(
        jnp.float32
    )
    # one-hot transpose selector: val row i -> output column i (cols 9..15
    # stay zero, matching the attr/d row layout)
    ri = jax.lax.broadcasted_iota(jnp.int32, (N_VALS, OUT_DIM), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (N_VALS, OUT_DIM), 1)
    sel = (ri == ci).astype(jnp.bfloat16)

    def body(j, acc):
        slot = j % 2

        @pl.when(j + 1 < nch)
        def _():
            for c in dma((j + 1) % 2, j + 1):
                c.start()

        for c in dma(slot, j):
            c.wait()
        for r in range(PC // 128):
            keys_r = kbuf[slot][r:r + 1, :]                    # (1, 128)
            hit = (keys_r == gcol).astype(jnp.bfloat16)
            vals9 = jnp.concatenate(
                [vbufs[i][slot][r:r + 1, :] for i in range(N_VALS)], axis=0
            )                                                  # (9, 128)
            for h in _split3(vals9):
                # exact transpose of the bf16 term, then the 0/1 hit matmul —
                # both single-pass, f32 accumulation
                t_h = jax.lax.dot_general(
                    h, sel, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )                                              # (128, 16)
                acc = acc + _dot1(hit, t_h.astype(jnp.bfloat16))
        return acc

    acc = jax.lax.fori_loop(
        0, nch, body, jnp.zeros((GB, OUT_DIM), jnp.float32)
    )
    out_ref[...] = acc


def segment_sums(key_s: jnp.ndarray, vals, n: int, *,
                 interpret: bool = False) -> jnp.ndarray:
    """key_s (P,) f32 sorted integer-valued gid keys; vals = 9 (P,) f32 rows
    ordered with key_s -> (n, 16) f32: out[g, i] = sum of vals[i] over rows
    with key == g (cols 9..15 zero). n must be a multiple of GB, P of 128."""
    (p,) = key_s.shape
    assert len(vals) == N_VALS, len(vals)
    assert n % GB == 0 and p % 128 == 0, (n, p)
    nb = n // GB
    qb = jnp.searchsorted(
        key_s, (jnp.arange(nb + 1, dtype=jnp.int32) * GB).astype(jnp.float32),
        side="left",
    ).astype(jnp.int32)

    # pad so the last window's aligned chunk sweep stays in bounds; pad keys
    # match no gid by value, pad vals are never accumulated
    pad_rows = PC // 128
    keys2d = jnp.pad(
        key_s.reshape(p // 128, 128), ((0, pad_rows), (0, 0)),
        constant_values=_PAD_KEY,
    )
    vals2d = [
        jnp.pad(v.reshape(p // 128, 128), ((0, pad_rows), (0, 0)))
        for v in vals
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (1 + N_VALS),
        out_specs=pl.BlockSpec((GB, OUT_DIM), lambda k, *_: (k, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=(
            [pltpu.VMEM((2, PC // 128, 128), jnp.float32)]        # keys
            + [pltpu.VMEM((2, PC // 128, 128), jnp.float32)] * N_VALS
            + [pltpu.SemaphoreType.DMA((2, 1 + N_VALS))]
        ),
    )
    return pl.pallas_call(
        _sums_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, OUT_DIM), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(qb, keys2d, *vals2d)
