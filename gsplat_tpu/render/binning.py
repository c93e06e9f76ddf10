"""Tile binning: (Gaussian, tile) pair expansion + depth sort, in static shapes.

TPU-native replacement for the CUDA duplicate+radix-sort stage of upstream 3DGS
(absent in the reference; SURVEY.md §7 hard part 2). Design:

1. Per-Gaussian tile rectangles -> per-Gaussian pair counts (0 when culled).
2. Pair expansion WITHOUT scatter: pair slot p finds its Gaussian with a single
   vectorized `searchsorted` over the inclusive count cumsum; its tile from the
   rectangle arithmetic. Static `pair_budget` slots; overflow pairs are dropped
   (the live total is returned so the driver can grow the budget and recompile).
3. One stable multi-key `lax.sort` by (tile_id, depth) - XLA's native sort rides
   the VPU; ties resolve to Gaussian index order (stable).
4. Chunk-aligned padded layout: every tile's segment is padded up to a multiple of
   `chunk` and scattered into a `padded_budget`-sized index array whose default
   entry is the null Gaussian (capacity row, inert by construction). This makes the
   Pallas kernel grid a dense 1-D sweep of (chunk, tile) blocks with *static* block
   maps - no atomics, no dynamic shapes (SURVEY.md §7 M2).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class Binning(NamedTuple):
    padded_gid: jnp.ndarray   # (padded_budget,) int32 Gaussian index; N_null when empty
    padded_eid: jnp.ndarray   # (padded_budget,) int32 expansion index; pair_budget when empty
    gauss_offsets: jnp.ndarray  # (N,) int32 exclusive pair-count cumsum (expansion order)
    gauss_cum: jnp.ndarray    # (N,) int32 inclusive pair-count cumsum
    tile_start: jnp.ndarray   # (num_tiles,) int32 chunk-aligned pair offset per tile
    tile_chunks: jnp.ndarray  # (num_tiles,) int32 number of chunks per tile
    tile_count: jnp.ndarray   # (num_tiles,) int32 live pairs per tile
    n_pairs: jnp.ndarray      # () int32 total live pairs (for budget monitoring)
    n_dropped: jnp.ndarray    # () int32 pairs dropped by budget overflow


def tile_grid(width: int, height: int, tile_size: int) -> Tuple[int, int]:
    tw = -(-width // tile_size)
    th = -(-height // tile_size)
    return tw, th


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
    """Build the sorted, chunk-aligned (Gaussian, tile) pair layout.

    All inputs should be stop-gradient'ed by the caller (binning is integer-valued;
    gradients flow through the later gather instead).
    """
    n = mean2d.shape[0]
    tw, th = tile_grid(width, height, tile_size)
    num_tiles = tw * th
    padded_budget = _padded_budget(pair_budget, num_tiles, chunk)

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

    # eidx rides along so the backward pass can map padded slots -> expansion
    # order (where pairs are grouped contiguously by Gaussian)
    tile_s, _, gid_s, eidx_s = jax.lax.sort(
        (tile, pair_depth, pair_gid, p), num_keys=2, is_stable=True
    )

    # per-tile segment boundaries on the sorted array
    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(tile_s, tids, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(tile_s, tids, side="right").astype(jnp.int32)
    tile_count = ends - starts
    padded_count = -(-tile_count // chunk) * chunk
    padded_cum = jnp.cumsum(padded_count)
    padded_start = padded_cum - padded_count

    # padded slot -> sorted position by GATHER (a pair_budget-sized scatter here
    # costs ~2x more than this marks+cumsum+row-gather construction on TPU)
    q = jnp.arange(padded_budget, dtype=jnp.int32)
    tmarks = jnp.zeros(padded_budget, jnp.int32).at[padded_start].add(1, mode="drop")
    tile_q = jnp.clip(jnp.cumsum(tmarks) - 1, 0, num_tiles - 1)
    ttbl = jnp.stack([starts, padded_start, tile_count], axis=1)  # (num_tiles, 3)
    tq = ttbl[tile_q]                                             # (padded_budget, 3)
    rank_q = q - tq[:, 1]
    valid_q = rank_q < tq[:, 2]
    p_src = jnp.clip(tq[:, 0] + rank_q, 0, pair_budget - 1)
    src_cols = jnp.stack([gid_s, eidx_s], axis=1)[p_src]  # one fused row-gather
    padded_gid = jnp.where(valid_q, src_cols[:, 0], n).astype(jnp.int32)
    padded_eid = jnp.where(valid_q, src_cols[:, 1], pair_budget).astype(jnp.int32)

    return Binning(
        padded_gid=padded_gid,
        padded_eid=padded_eid,
        gauss_offsets=offsets,
        gauss_cum=cum,
        tile_start=padded_start,
        tile_chunks=padded_count // chunk,
        tile_count=tile_count,
        n_pairs=jnp.minimum(total, pair_budget),
        n_dropped=n_dropped,
    )


def _padded_budget(pair_budget: int, num_tiles: int, chunk: int) -> int:
    """Static worst case: every tile wastes up to chunk-1 slots on alignment."""
    raw = pair_budget + num_tiles * (chunk - 1)
    return -(-raw // chunk) * chunk
