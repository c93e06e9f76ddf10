"""Pallas TPU segmented gradient reduction: gid-sorted d-rows -> per-Gaussian sums.

Replaces the XLA tail of the gradient reduction in render._rasterize_bwd —
stack to (budget, 16) + 16-column cumsum + boundary gather at gauss_cum +
adjacent diff — which cost ~40 ms/step sparse and ~90 ms/step dense on v5e
(the boundary row gather alone is ~28 ms at 1M rows: XLA prices every gather
row at ~latency, not bandwidth).

Design (TPU-first; no counterpart in the reference — its rasterizer stage is
absent, SURVEY.md §1 L2.5; upstream CUDA 3DGS accumulates per-Gaussian grads
with global atomics, which TPUs don't have):

- Input is the gid-SORTED gradient table as rows (16, P): row r of operand
  block = sorted_ops[1 + r] from the key sort, i.e. every Gaussian's d-rows
  are contiguous in the pair axis, and row IDROW carries each pair's Gaussian
  id as an exact f32 value (KEY_INVALID on masked/padding rows).
- The grid walks 128-Gaussian blocks. Each block's segments span the pair
  window [cum[g0-1], cum[g0+127]) — monotone, so the block DMAs that window
  in (16, PC)-chunk double-buffered slices. Only the two span bounds per
  block ride scalar prefetch ((nb,) i32 — prefetching the full cum table
  would blow SMEM, and feeding it as (N, 1) VMEM columns forces a T(1,128)
  layout that cascades relayout copies through the whole surrounding graph:
  measured +190 ms/step at 1M Gaussians).
- Per chunk, segment membership is ONE equality compare against the id row
  the chunk already carries: mask[g, i] = (id_row[i] == g0 + g), built on the
  VPU (Gaussians on sublanes, pairs on lanes); the contraction over pairs
  runs on the MXU: sums(128, 16) += mask @ d_chunk^T. The mask is EXACTLY
  representable in bf16 (0/1), so the product needs only a 3-term bf16 split
  of the d operand to reach HIGHEST's ~2^-24 input-error class in half the
  passes (see raster_pallas MATMUL_PRECISION note).
- Empty Gaussians never match the id row -> exact zero sums, including the
  budget-overflow case where the caller zeroes the whole cum table
  (binning.py "kept overflow" note): lo == hi == 0 -> zero chunks -> zeros.

Output: (NB*128, 16) f32 per-Gaussian gradient sums; column IDROW holds the
segment-sum of the id row itself (gid * segment length — discarded by the
caller along with columns 10..15).
Bit-accuracy: each Gaussian's sum is a 3-term-split MXU dot over its segment
instead of an f32 cumsum difference; both carry O(eps * segment length)
rounding, results agree to ~1e-6 relative (parity-tested in
tests/test_segred_pallas.py against the cumsum-diff oracle).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsplat_tpu.render.raster_pallas import ATTR_DIM, _split_terms

GB = 128          # Gaussians per grid step
PC = 512          # pairs per DMA chunk (16 x 512 x 4B = 32 KB per slot)
IDROW = 9         # d16 row carrying the pair's Gaussian id as an f32 value


def _segred_kernel(lo_ref, hi_ref, d_hbm, out_ref, buf, sems):
    k = pl.program_id(0)
    # block pair window [lo, hi): lo = cum[g0 - 1], hi = cum[g0 + GB - 1]
    lo = lo_ref[k]
    hi = hi_ref[k]
    astart = pl.multiple_of((lo // PC) * PC, PC)
    nch = (hi - astart + PC - 1) // PC

    def dma(slot, j):
        return pltpu.make_async_copy(
            d_hbm.at[:, pl.ds(astart + j * PC, PC)], buf.at[slot], sems.at[slot]
        )

    @pl.when(nch > 0)
    def _():
        dma(0, 0).start()

    # this block's Gaussian ids as an exact-f32 (GB, 1) column
    gcol = (k * GB + jax.lax.broadcasted_iota(jnp.int32, (GB, 1), 0)).astype(
        jnp.float32
    )

    def body(j, acc):
        slot = j % 2

        @pl.when(j + 1 < nch)
        def _():
            dma((j + 1) % 2, j + 1).start()

        dma(slot, j).wait()
        d = buf[slot]                                    # (16, PC)
        # segment membership straight off the id row the chunk carries:
        # ids are integer-valued f32 (< 2^24, render.py guard), equality is
        # exact; KEY_INVALID tail rows and other blocks' pairs never match
        mask = (d[IDROW:IDROW + 1, :] == gcol).astype(jnp.bfloat16)  # (GB, PC)
        # contract pairs (lanes of both operands): mask is bf16-exact, d takes
        # the 3-term split for f32-class accuracy (~2^-24 input error)
        for h in _split_terms(d, 3):
            acc = acc + jax.lax.dot_general(
                mask, h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )                                            # (GB, 16)
        return acc

    acc0 = jnp.zeros((GB, ATTR_DIM), jnp.float32)
    out_ref[...] = jax.lax.fori_loop(0, nch, body, acc0)


def segment_sum_sorted(d_t: jnp.ndarray, cum: jnp.ndarray = None, *,
                       lo_b: jnp.ndarray = None, hi_b: jnp.ndarray = None,
                       n: int = None, interpret: bool = False) -> jnp.ndarray:
    """d_t (16, P) gid-sorted gradient rows with row IDROW = per-pair Gaussian
    id (exact f32 value; anything >= N on padding rows). Returns (N, 16)
    per-Gaussian sums: out[g] = sum over d_t columns whose id == g.

    Block windows come from EITHER:
    - cum (N,) int32 inclusive per-Gaussian pair counts (monotone, <= P) when
      every Gaussian's pairs are present in the sorted rows, OR
    - lo_b/hi_b (N//GB,) int32 directly — e.g. from a searchsorted over the
      sorted key row when the rows are a subset of the pairs (round-3
      saturation compaction: pairs behind the early-exit have no d-row).

    N must be a multiple of 128 and P a multiple of 512."""
    p = d_t.shape[1]
    assert d_t.shape[0] == ATTR_DIM, d_t.shape
    assert p % PC == 0, p
    if cum is not None:
        n = cum.shape[0]
        cum = cum.astype(jnp.int32)
        lo_b = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), cum[GB - 1:-1:GB]]
        )                            # (nb,) first segment start per block
        hi_b = cum[GB - 1::GB]       # (nb,) last segment end per block
    assert n % GB == 0, n
    nb = n // GB
    assert lo_b.shape == (nb,) and hi_b.shape == (nb,), (lo_b.shape, nb)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((GB, ATTR_DIM), lambda k, *_: (k, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, ATTR_DIM, PC), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _segred_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, ATTR_DIM), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(lo_b, hi_b, d_t)
