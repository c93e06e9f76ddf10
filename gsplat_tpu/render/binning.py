"""Tile binning: (Gaussian, tile) pair expansion + depth sort, in static shapes.

TPU-native replacement for the CUDA duplicate+radix-sort stage of upstream 3DGS
(absent in the reference; SURVEY.md §7 hard part 2). Design:

1. Per-Gaussian tile rectangles -> per-Gaussian pair counts (0 when culled).
2. Pair expansion in ONE fused Pallas kernel (render/expand_pallas.py): XLA
   builds a live-compacted per-Gaussian column table and the monotone
   pair->row map (1-column scatter + Pallas prefix scan), the kernel resolves
   per-pair columns with 128-lane dynamic gathers over a DMA'd window and
   does the tile arithmetic + tight cull + key packing in the same pass
   (round-3 redesign: the previous all-XLA expansion cost ~190 ms at 42M
   pairs on v5e, the kernel ~20 ms). Tiny or non-128-multiple budgets take
   the equivalent `_expand_xla` fallback, which doubles as the parity oracle
   (tests/test_expand_pallas.py). Static `pair_budget` slots; overflow pairs
   are dropped (the live total is returned so the driver can grow the budget
   and recompile).
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
    gauss_cum: jnp.ndarray    # (N,) int32 inclusive KEPT-pair cumsum (grad segments)
    tile_start: jnp.ndarray   # (num_tiles,) int32 UNALIGNED pair offset per tile
    tile_count: jnp.ndarray   # (num_tiles,) int32 live pairs per tile
    out_start: jnp.ndarray    # (num_tiles,) int32 chunk-aligned bwd output offset
    n_pairs: jnp.ndarray      # () int32 total expansion slots (budget monitoring)
    n_dropped: jnp.ndarray    # () int32 pairs dropped by budget overflow
    n_culled: jnp.ndarray     # () int32 rect pairs removed by the tight tile cull
    grad_ok: jnp.ndarray      # () bool: False on kept-budget overflow (the
    #                           rasterizer zeroes that step's gradients)


def tile_grid(width: int, height: int, tile_size: int) -> Tuple[int, int]:
    tw = -(-width // tile_size)
    th = -(-height // tile_size)
    return tw, th


def depth_shift(num_tiles: int) -> int:
    """Bits of quantized depth in the packed (tile, depth) sort key.

    The pair sort key packs tile_id and depth into ONE non-negative int32 —
    the same design as upstream CUDA 3DGS's 64-bit (tile << 32 | depth-bits)
    radix key, narrowed to fit a TPU-native s32 sort (s64 sort on TPU is
    emulated and a 2-key sort moves an extra full operand through every pass).
    Positive IEEE-754 floats compare correctly as their int bits, so the top
    `db` bits of the depth's bit pattern are an order-preserving quantization:
    at 1080p/tile16 (8160 tiles, tile_bits=13, db=18) depths are ordered
    exactly unless they agree to ~2^-9 relative, in which case the stable sort falls back to
    Gaussian-index order (upstream resolves such near-ties by full mantissa;
    the compositing difference for splats at equal-to-1e-3 depth is below
    render tolerance). The reference oracle quantizes identically so parity
    tests are exact."""
    tile_bits = max(1, (num_tiles + 1).bit_length())
    db = 31 - tile_bits
    assert db >= 8, f"too many tiles ({num_tiles}) for a packed s32 sort key"
    return db


def pack_sort_key(tile: jnp.ndarray, depth: jnp.ndarray, num_tiles: int):
    """(P,) int32 tile ids + (P,) f32 positive depths -> packed s32 sort key."""
    db = depth_shift(num_tiles)
    dq = jax.lax.shift_right_logical(
        depth.astype(jnp.float32).view(jnp.int32), 32 - db
    )
    # +inf (invalid-pair sentinel) has bits 0x7f800000: >> (32-db) always fits
    # db bits for db <= 22; clamp anyway for tiny-db safety
    dq = jnp.minimum(dq, (1 << db) - 1)
    return (tile << db) | dq


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


ALPHA_MIN = 1.0 / 255.0  # matches raster_pallas.ALPHA_MIN (compositing skip)


def _rect_min_Q(a, b, c, lx, hx, ly, hy):
    """Exact min over the box [lx,hx]x[ly,hy] of the PSD quadratic
    Q(d) = 0.5*a*dx^2 + b*dx*dy + 0.5*c*dy^2 (box relative to the splat mean).

    Zero when the mean lies inside the box; otherwise the min is on the
    boundary — each edge restricts Q to a 1D quadratic with a closed-form
    clamped minimizer. This is the gsplat-style tight tile/ellipse test: the
    pair's max alpha in the tile is opacity * exp(-minQ)."""
    inside = (lx <= 0.0) & (hx >= 0.0) & (ly <= 0.0) & (hy >= 0.0)
    a_s = jnp.maximum(a, 1e-12)
    c_s = jnp.maximum(c, 1e-12)

    def edge_x(e):
        dy = jnp.clip(-b * e / c_s, ly, hy)
        return 0.5 * a * e * e + b * e * dy + 0.5 * c * dy * dy

    def edge_y(e):
        dx = jnp.clip(-b * e / a_s, lx, hx)
        return 0.5 * a * dx * dx + b * dx * e + 0.5 * c * e * e

    m = jnp.minimum(
        jnp.minimum(edge_x(lx), edge_x(hx)), jnp.minimum(edge_y(ly), edge_y(hy))
    )
    return jnp.where(inside, 0.0, jnp.maximum(m, 0.0))


def _expand_xla(
    mean2d, depth, x0, y0, rect_w, counts, cum, offsets, total,
    cull_conic, cull_opacity, *, n, tw, num_tiles, tile_size, pair_budget,
    do_cull,
):
    """Fallback pair expansion in pure XLA (tiny / non-128-multiple budgets;
    also the oracle the fused Pallas kernel is parity-tested against).
    Returns (key, pair_gid) in expansion order; invalid/culled pairs carry
    gid == n and the invalid sort key."""
    p = jnp.arange(pair_budget, dtype=jnp.int32)
    marks = jnp.zeros(pair_budget, jnp.int32).at[offsets].add(1, mode="drop")
    gid_c = jnp.clip(jnp.cumsum(marks) - 1, 0, n - 1)

    # Expand per-Gaussian columns to per-pair rows. Columns (all int32 — f32
    # attributes ride as raw bit patterns, exact under the int32 B2 telescoping
    # below): [x0 | y0<<16, max(rect_w,1), offsets, depth bits] + (cull only)
    # [mean_x, mean_y, conic_a, conic_b, conic_c, opacity] bits.
    col_list = [
        x0 | (y0 << 16), jnp.maximum(rect_w, 1), offsets,
        depth.astype(jnp.float32).view(jnp.int32),
    ]
    if do_cull:
        col_list += [
            mean2d[:, 0].astype(jnp.float32).view(jnp.int32),
            mean2d[:, 1].astype(jnp.float32).view(jnp.int32),
            cull_conic[:, 0].astype(jnp.float32).view(jnp.int32),
            cull_conic[:, 1].astype(jnp.float32).view(jnp.int32),
            cull_conic[:, 2].astype(jnp.float32).view(jnp.int32),
            cull_opacity.astype(jnp.float32).view(jnp.int32),
        ]
    cols = jnp.stack(col_list, axis=1)  # (n, 4 or 10) int32
    if pair_budget >= 8 * n:
        # DENSE regime: a pair_budget-row gather pays the per-row random-access
        # cost for every pair even though gid_c is MONOTONE — each Gaussian's
        # rows are consecutive. Exploit that: scatter each live Gaussian's
        # delta vs the previous live Gaussian at its segment start, then an
        # int32 cumsum telescopes back to exactly cols[gid_c].
        live = counts > 0
        ord_ = jnp.argsort(jnp.where(live, 0, 1).astype(jnp.int32), stable=True)
        cols_l = cols[ord_]                        # (n, 4), live rows first
        live_l = live[ord_]
        offs_l = jnp.where(live_l, offsets[ord_], pair_budget)
        diffs = cols_l - jnp.concatenate(
            [jnp.zeros((1, cols.shape[1]), cols.dtype), cols_l[:-1]], axis=0
        )
        diffs = jnp.where(live_l[:, None], diffs, 0)
        pc = jnp.cumsum(
            jnp.zeros((pair_budget, cols.shape[1]), jnp.int32)
            .at[offs_l].add(diffs, mode="drop"),
            axis=0,
        )
    else:
        pc = cols[gid_c]                           # (pair_budget, 4) row gather
    local = p - pc[:, 2]
    tx = (pc[:, 0] & 0xFFFF) + local % pc[:, 1]
    ty = (pc[:, 0] >> 16) + local // pc[:, 1]
    tile = ty * tw + tx
    valid = p < total

    if do_cull:
        mx = pc[:, 4].view(jnp.float32)
        my = pc[:, 5].view(jnp.float32)
        ca = pc[:, 6].view(jnp.float32)
        cb = pc[:, 7].view(jnp.float32)
        cc = pc[:, 8].view(jnp.float32)
        op = pc[:, 9].view(jnp.float32)
        ts = float(tile_size)
        lx = tx.astype(jnp.float32) * ts - mx   # tile pixel-center box rel mean
        ly = ty.astype(jnp.float32) * ts - my
        min_q = _rect_min_Q(ca, cb, cc, lx, lx + (ts - 1.0), ly, ly + (ts - 1.0))
        # 2% slack keeps any pair f32 rounding could misprice near the cutoff
        keep = op * jnp.exp(-min_q) >= ALPHA_MIN * 0.98
        valid_k = valid & keep
    else:
        valid_k = valid

    tile = jnp.where(valid_k, tile, num_tiles).astype(jnp.int32)
    pair_depth = jnp.where(
        valid_k, pc[:, 3].view(jnp.float32), jnp.inf
    ).astype(jnp.float32)
    pair_gid = jnp.where(valid_k, gid_c, n).astype(jnp.int32)
    key = pack_sort_key(tile, pair_depth, num_tiles)
    return key, pair_gid


def _expand_fused(
    mean2d, depth, x0, y0, rect_w, counts, total,
    cull_conic, cull_opacity, *, n, tw, num_tiles, tile_size, pair_budget,
    do_cull, interpret,
):
    """Fused Pallas pair expansion (see render/expand_pallas.py): XLA builds
    the live-compacted per-Gaussian column table and the monotone pair->row
    map, the kernel does everything per-pair. Bit-identical to _expand_xla."""
    from gsplat_tpu.render.expand_pallas import WIN, expand_pairs
    from gsplat_tpu.render.scan_pallas import prefix_sum_flags

    db = depth_shift(num_tiles)
    live = counts > 0
    # stable live-first partition as ONE single-operand sort: the row index
    # rides the low bits of the key (dead flag above), so no second iota
    # operand moves through the compare-exchange passes and the permutation
    # needs no separate gather (argsort cost ~27 ms at 1M rows on v5e, this
    # form ~half)
    idx_bits = max(1, (n - 1).bit_length())
    assert idx_bits <= 30, n
    iota_n = jnp.arange(n, dtype=jnp.int32)
    packed = jnp.where(live, iota_n, iota_n | (1 << idx_bits))
    ord_ = jax.lax.sort((packed,), num_keys=1, is_stable=False)[0] & (
        (1 << idx_bits) - 1
    )

    w_safe = jnp.maximum(rect_w, 1)
    dq = jnp.minimum(
        jax.lax.shift_right_logical(
            depth.astype(jnp.float32).view(jnp.int32), 32 - db
        ),
        (1 << db) - 1,
    )
    recip = (1.0 / w_safe.astype(jnp.float32)).view(jnp.int32)
    col_list = [x0 | (y0 << 16), w_safe, dq, recip]
    if do_cull:
        col_list += [
            mean2d[:, 0].astype(jnp.float32).view(jnp.int32),
            mean2d[:, 1].astype(jnp.float32).view(jnp.int32),
            cull_conic[:, 0].astype(jnp.float32).view(jnp.int32),
            cull_conic[:, 1].astype(jnp.float32).view(jnp.int32),
            cull_conic[:, 2].astype(jnp.float32).view(jnp.int32),
            cull_opacity.astype(jnp.float32).view(jnp.int32),
        ]
    # counts rides the multi-column row gather as the LAST gathered column
    # (inert for the kernel): a separate 1-column counts[ord_] gather costs
    # ~28 ns/row on v5e vs ~0.6 ns/row amortized here — 27 ms/step at 1M rows
    col_list += [counts]
    cols_l = jnp.stack(col_list, axis=1)[ord_]          # (n, K) row gather
    counts_l = cols_l[:, -1]
    csl = jnp.cumsum(counts_l)
    offs_l = (csl - counts_l).astype(jnp.int32)
    live_l = counts_l > 0
    cols_t = jnp.concatenate(
        [cols_l, ord_[:, None], offs_l[:, None]], axis=1
    ).T                                                  # (NC, n)
    n_pad = -(-n // 128) * 128 + WIN + 128
    cols_t = jnp.pad(cols_t, ((0, 0), (0, n_pad - n)))

    # segment-start marks over LIVE rows only (strictly increasing offsets =>
    # 0/1 flags => gid_c increments by <= 1 per slot, the kernel's window bound)
    marks = (
        jnp.zeros(pair_budget, jnp.int32)
        .at[jnp.where(live_l, offs_l, pair_budget)]
        .add(1, mode="drop")
    )
    gid_c = prefix_sum_flags(marks, bias=-1, interpret=interpret)
    return expand_pairs(
        cols_t, gid_c, total, tw=tw, tile_size=tile_size, db=db,
        num_tiles=num_tiles, n_orig=n, do_cull=do_cull,
        alpha_thresh=ALPHA_MIN * 0.98, interpret=interpret,
    )


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
    cull_conic: jnp.ndarray = None,
    cull_opacity: jnp.ndarray = None,
    kept_budget: int = None,
    interpret: bool = None,
    fused: bool = None,
) -> Binning:
    """Build the sorted compact (Gaussian, tile) pair layout + per-tile tables.

    All inputs should be stop-gradient'ed by the caller (binning is integer-valued;
    gradients flow through the attribute gather instead). pair_budget must be a
    multiple of `chunk` (the kernels DMA chunk-aligned supersets of segments).

    cull_conic (N,3) + cull_opacity (N,) enable the TIGHT TILE CULL: rect pairs
    whose maximum alpha anywhere in the tile is provably below the compositing
    skip threshold (1/255) are keyed invalid, so they sort past every live tile
    segment and never reach the kernels, the backward d-array, or the gradient
    reduction. The test is conservative (exact quadratic min over the tile box,
    2% threshold slack for f32 rounding), so the rendered image is IDENTICAL —
    upstream CUDA 3DGS keeps every bounding-rect pair (its per-pixel loop just
    skips them); public gsplat showed tile-level ellipse tests remove 20-60% of
    pairs on trained scenes. Culled pairs still occupy expansion SLOTS
    (n_pairs/budget semantics unchanged); the win is in every pair-proportional
    stage after the sort.

    kept_budget (defaults to pair_budget) sizes the POST-SORT stages: the sort
    compacts culled/invalid pairs to the tail, so the attribute gather, the
    kernels, the backward d-array, and the gradient reduction only need the
    kept prefix. Kept pairs beyond kept_budget are dropped and counted in
    n_dropped (the driver's adaptive-budget loop handles growth).
    """
    assert pair_budget % chunk == 0, (pair_budget, chunk)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if kept_budget is None:
        kept_budget = pair_budget
    kept_budget = min(kept_budget, pair_budget)
    n = mean2d.shape[0]
    tw, th = tile_grid(width, height, tile_size)
    num_tiles = tw * th
    # The cull test needs 6 per-pair attribute columns. In the gather regime
    # they ride the existing per-row gather for free; in the B2 regime
    # (pair_budget >= 8n) each extra column adds a pair-long scatter+cumsum
    # (~23 ms/col at 42M pairs on v5e), which only pays off when a reduced
    # kept_budget shrinks the post-sort stages.
    do_cull = cull_conic is not None and (
        pair_budget < 8 * n or kept_budget < pair_budget
    )

    x0, y0, x1, y1 = tile_rects(mean2d, radius, tw, th, tile_size)
    rect_w = jnp.maximum(x1 - x0, 0)
    rect_h = jnp.maximum(y1 - y0, 0)
    counts = jnp.where(radius > 0, rect_w * rect_h, 0).astype(jnp.int32)

    cum = jnp.cumsum(counts)                      # inclusive
    total = cum[-1]
    offsets = cum - counts                        # exclusive
    n_dropped = jnp.maximum(total - pair_budget, 0)

    if fused is None:
        # the fused kernel needs 128-multiple budgets; in interpreter mode
        # its unrolled gather rounds are pathologically slow, and the XLA
        # fallback is the same math (parity-tested), so interpret defaults off
        fused = not interpret and pair_budget % 128 == 0 and pair_budget >= 1024
    if fused:
        key, pair_gid = _expand_fused(
            mean2d, depth, x0, y0, rect_w, counts, total,
            cull_conic, cull_opacity, n=n, tw=tw, num_tiles=num_tiles,
            tile_size=tile_size, pair_budget=pair_budget, do_cull=do_cull,
            interpret=interpret,
        )
    else:
        key, pair_gid = _expand_xla(
            mean2d, depth, x0, y0, rect_w, counts, cum, offsets, total,
            cull_conic, cull_opacity, n=n, tw=tw, num_tiles=num_tiles,
            tile_size=tile_size, pair_budget=pair_budget, do_cull=do_cull,
        )

    # invalid AND culled pairs both carry gid == n (and the invalid key)
    n_valid = jnp.minimum(total, pair_budget)
    if do_cull:
        valid_k = pair_gid != n
    key_s, gid_s = jax.lax.sort((key, pair_gid), num_keys=2, is_stable=False)

    # per-tile segment boundaries on the sorted array (tiny: num_tiles-sized);
    # clamped to kept_budget — the sort compacts culled/invalid pairs to the
    # tail, so the kept prefix is exactly the pairs the kernels composite
    db = depth_shift(num_tiles)
    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(key_s, tids << db, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(key_s, (tids + 1) << db, side="left").astype(jnp.int32)
    starts = jnp.minimum(starts, kept_budget)
    ends = jnp.minimum(ends, kept_budget)
    tile_count = ends - starts
    # backward output regions: one aligned span per tile covering the same
    # chunk count the kernel sweeps (head + count, rounded up)
    head = starts % chunk
    nch = -(-(head + tile_count) // chunk)
    out_sizes = nch * chunk
    out_start = (jnp.cumsum(out_sizes) - out_sizes).astype(jnp.int32)

    if do_cull:
        # gradient segment boundaries must count KEPT pairs only (culled rows
        # never reach the backward d-array): cumulative kept slots per Gaussian
        from gsplat_tpu.render.scan_pallas import prefix_sum_flags

        Kc = prefix_sum_flags(valid_k.astype(jnp.int32), interpret=interpret)
        cum_c = jnp.minimum(cum, pair_budget)
        gauss_cum = jnp.where(cum_c == 0, 0, Kc[jnp.maximum(cum_c - 1, 0)])
        kept_total = Kc[-1]
        n_culled = n_valid - kept_total
    else:
        gauss_cum = cum
        kept_total = n_valid
        n_culled = jnp.zeros((), jnp.int32)
    # kept overflow: the kernels then composite a TRUNCATED pair set (tile
    # segments clamped to kept_budget). The rasterizer zeroes that step's
    # gradients via grad_ok, n_dropped reports the overflow, and the driver's
    # adaptive budget regrows (<= a few overflow steps per growth event).
    overflow = kept_total > kept_budget
    gauss_cum = jnp.where(overflow, 0, jnp.minimum(gauss_cum, kept_budget))
    n_dropped = n_dropped + jnp.maximum(kept_total - kept_budget, 0)

    return Binning(
        grad_ok=jnp.logical_not(overflow),
        gid_s=gid_s,
        gauss_offsets=offsets,
        gauss_cum=gauss_cum,
        tile_start=starts,
        tile_count=tile_count,
        out_start=out_start,
        n_pairs=jnp.minimum(total, pair_budget),
        n_dropped=n_dropped,
        n_culled=n_culled,
    )
