"""Tile binning: (Gaussian, tile) pair expansion + depth sort, in static shapes.

TPU-native replacement for the CUDA duplicate+radix-sort stage of upstream 3DGS
(absent in the reference; SURVEY.md §7 hard part 2). Design:

1. Per-Gaussian tile rectangles -> per-Gaussian pair counts (0 when culled).
2. Pair expansion WITHOUT scatter: segment-start marks + cumsum recover each
   pair slot's Gaussian; its tile comes from the rectangle arithmetic. Static
   `pair_budget` slots; overflow pairs are dropped (the live total is returned
   so the driver can grow the budget and recompile).
3. One stable multi-key `lax.sort` by (tile_id, depth) - XLA's native sort rides
   the VPU; ties resolve to Gaussian index order (stable).
4. COMPACT layout (round-2 redesign): the sorted array itself is the kernel
   input — per-tile segments [tile_start, tile_start+tile_count) are NOT
   aligned or padded. The Pallas kernels DMA the chunk-aligned superset of each
   segment and mask the head/tail rows (reading a neighbor tile's rows is
   harmless — they are masked to alpha 0). This removes the whole padded-slot
   index plumbing (two pair-budget-sized maps, one scatter, three gathers) that
   cost ~55 ms/step at 1M Gaussians @1080p in round 1. Only the BACKWARD
   output gets per-tile chunk-aligned regions (`out_start`, sized by
   `out_budget`) so no two tiles ever write the same chunk; each d-row carries
   its own Gaussian-id sort key (attr row 9) so the gradient segment-reduction
   is a single key sort + cumsum-diff, with no padded->expansion map.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class Binning(NamedTuple):
    gid_s: jnp.ndarray        # (pair_budget,) int32 sorted Gaussian ids; N when empty
    gauss_offsets: jnp.ndarray  # (N,) int32 exclusive pair-count cumsum
    gauss_cum: jnp.ndarray    # (N,) int32 inclusive pair-count cumsum
    tile_start: jnp.ndarray   # (num_tiles,) int32 UNALIGNED pair offset per tile
    tile_count: jnp.ndarray   # (num_tiles,) int32 live pairs per tile
    out_start: jnp.ndarray    # (num_tiles,) int32 chunk-aligned bwd output offset
    n_pairs: jnp.ndarray      # () int32 total live pairs (for budget monitoring)
    n_dropped: jnp.ndarray    # () int32 pairs dropped by budget overflow


def tile_grid(width: int, height: int, tile_size: int) -> Tuple[int, int]:
    tw = -(-width // tile_size)
    th = -(-height // tile_size)
    return tw, th


def out_budget(pair_budget: int, num_tiles: int, chunk: int) -> int:
    """Static size of the backward d-array: every tile's aligned chunk range
    can exceed its live count by head (< chunk) + tail padding (< chunk)."""
    return pair_budget + 2 * chunk * num_tiles


def tile_rects(
    mean2d: jnp.ndarray, radius: jnp.ndarray, tw: int, th: int, tile_size: int
):
    """Upstream getRect semantics: clamped [min, max) tile rectangle per Gaussian."""
    mx, my = mean2d[:, 0], mean2d[:, 1]
    x0 = jnp.clip(((mx - radius) / tile_size).astype(jnp.int32), 0, tw)
    y0 = jnp.clip(((my - radius) / tile_size).astype(jnp.int32), 0, th)
    x1 = jnp.clip(((mx + radius + tile_size - 1) // tile_size).astype(jnp.int32), 0, tw)
    y1 = jnp.clip(((my + radius + tile_size - 1) // tile_size).astype(jnp.int32), 0, th)
    return x0, y0, x1, y1


def bin_gaussians(
    mean2d: jnp.ndarray,
    radius: jnp.ndarray,
    depth: jnp.ndarray,
    *,
    width: int,
    height: int,
    tile_size: int,
    chunk: int,
    pair_budget: int,
) -> Binning:
    """Build the sorted compact (Gaussian, tile) pair layout + per-tile tables.

    All inputs should be stop-gradient'ed by the caller (binning is integer-valued;
    gradients flow through the attribute gather instead). pair_budget must be a
    multiple of `chunk` (the kernels DMA chunk-aligned supersets of segments).
    """
    assert pair_budget % chunk == 0, (pair_budget, chunk)
    n = mean2d.shape[0]
    tw, th = tile_grid(width, height, tile_size)
    num_tiles = tw * th

    x0, y0, x1, y1 = tile_rects(mean2d, radius, tw, th, tile_size)
    rect_w = jnp.maximum(x1 - x0, 0)
    rect_h = jnp.maximum(y1 - y0, 0)
    counts = jnp.where(radius > 0, rect_w * rect_h, 0).astype(jnp.int32)

    cum = jnp.cumsum(counts)                      # inclusive
    total = cum[-1]
    offsets = cum - counts                        # exclusive
    n_dropped = jnp.maximum(total - pair_budget, 0)

    # pair -> Gaussian via segment-start marks + cumsum (a searchsorted here would
    # cost ~17 serial gather rounds over pair_budget elements — measured 30x slower
    # on TPU than this scatter+scan)
    p = jnp.arange(pair_budget, dtype=jnp.int32)
    marks = jnp.zeros(pair_budget, jnp.int32).at[offsets].add(1, mode="drop")
    gid_c = jnp.clip(jnp.cumsum(marks) - 1, 0, n - 1)

    # ONE row-gather of all per-Gaussian columns (5 scalar gathers would each pay
    # the full per-element gather cost)
    cols = jnp.stack(
        [x0, y0, jnp.maximum(rect_w, 1), offsets,
         depth.astype(jnp.float32).view(jnp.int32)], axis=1
    )  # (n, 5) int32
    pc = cols[gid_c]                               # (pair_budget, 5)
    local = p - pc[:, 3]
    tx = pc[:, 0] + local % pc[:, 2]
    ty = pc[:, 1] + local // pc[:, 2]
    tile = ty * tw + tx
    valid = p < total
    tile = jnp.where(valid, tile, num_tiles).astype(jnp.int32)
    pair_depth = jnp.where(
        valid, pc[:, 4].view(jnp.float32), jnp.inf
    ).astype(jnp.float32)
    pair_gid = jnp.where(valid, gid_c, n).astype(jnp.int32)

    tile_s, _, gid_s = jax.lax.sort(
        (tile, pair_depth, pair_gid), num_keys=2, is_stable=True
    )

    # per-tile segment boundaries on the sorted array (tiny: num_tiles-sized)
    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(tile_s, tids, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(tile_s, tids, side="right").astype(jnp.int32)
    tile_count = ends - starts
    # backward output regions: one aligned span per tile covering the same
    # chunk count the kernel sweeps (head + count, rounded up)
    head = starts % chunk
    nch = -(-(head + tile_count) // chunk)
    out_sizes = nch * chunk
    out_start = (jnp.cumsum(out_sizes) - out_sizes).astype(jnp.int32)

    return Binning(
        gid_s=gid_s,
        gauss_offsets=offsets,
        gauss_cum=cum,
        tile_start=starts,
        tile_count=tile_count,
        out_start=out_start,
        n_pairs=jnp.minimum(total, pair_budget),
        n_dropped=n_dropped,
    )
