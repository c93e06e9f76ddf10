"""Pallas TPU run compaction: copy per-tile chunk-aligned regions of a sorted
pair array into their compacted destinations with bulk DMA.

The saturation bound cull (binning.py) keeps, per tile, an aligned prefix of
its sorted pairs and packs those regions contiguously. Expressing that move
as an XLA gather (`gid_s[src]` with a telescoped source map) prices at
~23 ns/row on v5e — 42 ms at the dense bench's 1.8M survivors (1-column
gathers pay full random-access latency per element; scripts/micro_sort.py).
The move is actually ~3k CONTIGUOUS runs, so this kernel issues one bulk DMA
per 16-chunk block instead: grid = tiles, each step streams its region
HBM->HBM in (16, 128) row blocks.

Design notes (no counterpart in the reference — its rasterizer stage is
absent, SURVEY.md L2.5):
- Row space: the pair array is viewed as (S/128, 128) so a 128-pair chunk is
  one row; region starts are chunk-aligned by construction (binning).
- Blocks may OVER-COPY up to 15 rows past their region into the next tile's
  region: grid steps run sequentially on TPU and every DMA is retired before
  the step ends, so the next tile simply overwrites the overhang. The source
  and destination arrays are padded by one block so the overhang of the last
  tile stays in bounds.
- The destination is pre-filled with `fill` through input_output_aliases:
  rows past the last region (and all rows when a tile has no pairs) must
  decode as the null Gaussian, not uninitialized HBM.
- Budget-overflow steps clamp rbase (regions may then overlap). Overlapping
  writes produce garbage content, matching the XLA path's documented
  semantics: the caller zeroes that step's gradients and regrows the budget.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 16  # chunks (128-pair rows) per DMA block: 16*128*4B = 8 KB


def _compact_kernel(astart_ref, rbase_ref, nch_ref, src_hbm, init_hbm,
                    out_hbm, sems):
    del init_hbm  # aliased to out_hbm (pre-filled with the null pattern)
    t = pl.program_id(0)
    a0 = astart_ref[t]
    r0 = rbase_ref[t]
    nb = (nch_ref[t] + BLK - 1) // BLK

    def dma(b):
        return pltpu.make_async_copy(
            src_hbm.at[pl.ds(a0 + b * BLK, BLK), :],
            out_hbm.at[pl.ds(r0 + b * BLK, BLK), :],
            sems.at[b % 2],
        )

    @pl.when(nb > 0)
    def _():
        dma(0).start()

    def body(b, _):
        @pl.when(b + 1 < nb)
        def _():
            dma(b + 1).start()

        dma(b).wait()
        return 0

    jax.lax.fori_loop(0, nb, body, 0)


def compact_runs(src: jnp.ndarray, astart: jnp.ndarray, rbase: jnp.ndarray,
                 nch: jnp.ndarray, *, out_size: int, fill: int,
                 interpret: bool = False) -> jnp.ndarray:
    """out[rbase[t]*128 : (rbase[t]+nch[t])*128] = src[astart[t]*128 : ...]
    per tile t; uncovered rows hold `fill`.

    src (S,) int32 with S % 128 == 0; astart/rbase/nch (T,) int32 in CHUNK
    (128-row) units; out_size % 128 == 0. Regions must be written in
    ascending-t overwrite order (binning's rbase cumsum guarantees it)."""
    (s_in,) = src.shape
    assert s_in % 128 == 0 and out_size % 128 == 0, (s_in, out_size)
    rows_in = s_in // 128
    rows_out = out_size // 128
    num_tiles = astart.shape[0]
    # one-block padding absorbs the last tile's over-copy; the source pad
    # also keeps clamped-overflow reads in bounds
    src2d = jnp.pad(src.reshape(rows_in, 128), ((0, BLK), (0, 0)))
    init = jnp.full((rows_out + BLK, 128), fill, jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((2,))],
    )
    out = pl.pallas_call(
        _compact_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows_out + BLK, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        # operand index counts the 3 scalar-prefetch args: init is operand 4
        input_output_aliases={4: 0},
        interpret=interpret,
    )(astart.astype(jnp.int32), rbase.astype(jnp.int32),
      nch.astype(jnp.int32), src2d, init)
    return out[:rows_out].reshape(out_size)
