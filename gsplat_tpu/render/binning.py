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
    gid_s: jnp.ndarray        # (pair_budget | sat_budget,) int32 sorted Gaussian
    #                           ids (sat cull: compacted survivors); N when empty
    tile_start: jnp.ndarray   # (num_tiles,) int32 UNALIGNED pair offset per tile
    tile_count: jnp.ndarray   # (num_tiles,) int32 live pairs per tile
    n_pairs: jnp.ndarray      # () int32 total expansion slots (budget monitoring)
    n_dropped: jnp.ndarray    # () int32 pairs dropped by budget overflow
    n_culled: jnp.ndarray     # () int32 rect pairs removed by the tight tile cull
    n_sat: jnp.ndarray        # () int32 chunk-aligned slots the saturation bound
    #                           cull kept (0 when the cull is off) — sizes sat_budget
    grad_ok: jnp.ndarray      # () bool: False on kept/sat-budget overflow (the
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


def _rect_max_Q(a, b, c, lx, hx, ly, hy):
    """Exact max over the box [lx,hx]x[ly,hy] of the PSD quadratic
    Q(d) = 0.5*a*dx^2 + b*dx*dy + 0.5*c*dy^2 — convex, so the max is at one
    of the 4 corners. Q at the farthest corner lower-bounds every pixel's
    Gaussian falloff in the tile: alpha_min = opacity * exp(-maxQ)."""

    def Q(dx, dy):
        return 0.5 * a * dx * dx + b * dx * dy + 0.5 * c * dy * dy

    return jnp.maximum(
        jnp.maximum(Q(lx, ly), Q(lx, hy)), jnp.maximum(Q(hx, ly), Q(hx, hy))
    )


# --- saturation bound cull (round 3) -----------------------------------------
# Per-pair conservative MINIMUM alpha over the whole tile (opacity * exp(-maxQ),
# thresholded/clamped with the kernel's own _alphas_from_power semantics),
# quantized DOWN to 6 bits of -log2(1 - alpha_min) in units of SAT_Q_SCALE and
# packed into the gid's high bits so it rides the pair sort for free. After the
# sort, an inclusive cumsum of q along each tile's depth-ordered pairs lower-
# bounds -log2(T) for EVERY pixel; once the bound passes -log2(T_EPS) the
# forward kernel provably early-exits at that chunk, so later chunks can be cut
# BEFORE the attribute gather / kernels / backward — bit-identical image and
# gradients (quantization is conservative, cut points are chunk-aligned on the
# kernel's own DMA grid, and the compacted layout preserves each tile's head
# offset so chunk contents are unchanged).
SAT_Q_SCALE = 0.25   # q units of -log2(1 - alpha_min); 6 bits cover alpha<=0.99
SAT_Q_BITS = 6
# cum_q * SAT_Q_SCALE > -log2(T_EPS=1e-4) = 13.2877  =>  cum_q >= 54
SAT_CUT = 54
_LOG2E = 1.4426950408889634


def _sat_q(op, max_q):
    """6-bit quantized -log2(1 - alpha_min) (rounded DOWN => conservative).
    2% slack absorbs f32 rounding vs the kernel's per-pixel alpha (the same
    slack the tight cull uses); alpha below the kernel's 1/255 skip threshold
    contributes 0 (those pixels may be zeroed by _alphas_from_power)."""
    raw_min = op * jnp.exp(-max_q) * 0.98
    alpha_min = jnp.where(raw_min >= 1.0 / 255.0,
                          jnp.minimum(raw_min, 0.99), 0.0)
    lb = -jnp.log1p(-alpha_min) * _LOG2E
    q = jnp.floor(lb * (1.0 / SAT_Q_SCALE)).astype(jnp.int32)
    return jnp.clip(q, 0, (1 << SAT_Q_BITS) - 1)


def _expand_xla(
    mean2d, depth, x0, y0, rect_w, counts, cum, offsets, total,
    cull_conic, cull_opacity, *, n, tw, num_tiles, tile_size, pair_budget,
    do_cull, sat_pack=False,
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

    gid_out = gid_c
    if sat_pack:
        # LOW-bit packing (gid << 6 | q): gid stays the leading tie-break of
        # the 2-key pair sort (bit-identical order vs sat off; gid < 2^24 so
        # the shifted value stays a positive int32); invalid pairs carry n<<6
        assert do_cull, "sat_pack needs the cull attribute columns"
        max_q = _rect_max_Q(ca, cb, cc, lx, lx + (ts - 1.0), ly, ly + (ts - 1.0))
        gid_out = (gid_c << SAT_Q_BITS) | _sat_q(op, max_q)
    tile = jnp.where(valid_k, tile, num_tiles).astype(jnp.int32)
    pair_depth = jnp.where(
        valid_k, pc[:, 3].view(jnp.float32), jnp.inf
    ).astype(jnp.float32)
    pair_gid = jnp.where(
        valid_k, gid_out, (n << SAT_Q_BITS) if sat_pack else n
    ).astype(jnp.int32)
    key = pack_sort_key(tile, pair_depth, num_tiles)
    return key, pair_gid


def _expand_fused(
    mean2d, depth, x0, y0, rect_w, counts, total,
    cull_conic, cull_opacity, *, n, tw, num_tiles, tile_size, pair_budget,
    do_cull, sat_pack=False, interpret,
):
    """Fused Pallas pair expansion (see render/expand_pallas.py): XLA builds
    the live-compacted per-Gaussian column table and the per-micro-block
    window bases, the kernel does everything per-pair (including the
    pair->row resolution, by binary search of the table's offset column).
    Bit-identical to _expand_xla."""
    from gsplat_tpu.render.expand_pallas import MB_PAIRS, WIN, expand_pairs

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
    cols_t = jnp.concatenate(
        [cols_l, ord_[:, None], offs_l[:, None]], axis=1
    ).T                                                  # (NC, n)
    n_pad = -(-n // 128) * 128 + WIN + 128
    cols_t = jnp.pad(cols_t, ((0, 0), (0, n_pad - n)))
    # the kernel binary-searches the offset row: live offsets strictly
    # increase, dead rows carry `total` (csl tail) — table PADDING must sort
    # after both, so it carries INT32_MAX instead of the pad zeros
    cols_t = cols_t.at[-1, n:].set(jnp.iinfo(jnp.int32).max)

    # per-micro-block window bases: the row owning each MB_PAIRS-pair block's
    # first pair, #{csl <= p} - form. ~S/MB_PAIRS queries (tiny next to the
    # pair-long marks scatter + prefix scan this replaces — 8.8 ms at the
    # sparse bench); method='sort' (the 'scan' binary search would pay
    # log2(n) gather rounds).
    nmb = -(-pair_budget // MB_PAIRS)
    qs = jnp.arange(nmb, dtype=jnp.int32) * MB_PAIRS
    bases = jnp.searchsorted(csl, qs, side="right", method="sort").astype(
        jnp.int32
    )
    return expand_pairs(
        cols_t, bases, total, pair_budget, tw=tw, tile_size=tile_size, db=db,
        num_tiles=num_tiles, n_orig=n, do_cull=do_cull,
        alpha_thresh=ALPHA_MIN * 0.98, sat_pack=sat_pack, interpret=interpret,
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
    sat_budget: int = None,
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
    do_sat = sat_budget is not None
    if do_sat:
        if cull_conic is None:
            raise ValueError("sat_budget needs cull_conic/cull_opacity")
        if n >= (1 << 24):
            raise ValueError(
                f"saturation bound cull packs 6 q-bits under the gid: "
                f"n={n} must stay below 2^24"
            )
        assert sat_budget % chunk == 0, (sat_budget, chunk)
        # kept * 63 must stay an exact int32 cumsum
        assert kept_budget < (1 << 25), kept_budget
    do_cull = cull_conic is not None and (
        pair_budget < 8 * n or kept_budget < pair_budget or do_sat
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
            sat_pack=do_sat, interpret=interpret,
        )
    else:
        key, pair_gid = _expand_xla(
            mean2d, depth, x0, y0, rect_w, counts, cum, offsets, total,
            cull_conic, cull_opacity, n=n, tw=tw, num_tiles=num_tiles,
            tile_size=tile_size, pair_budget=pair_budget, do_cull=do_cull,
            sat_pack=do_sat,
        )

    # invalid AND culled pairs both carry the null gid (and the invalid key)
    n_valid = jnp.minimum(total, pair_budget)
    gid_null = (n << SAT_Q_BITS) if do_sat else n
    # num_keys=2 deliberately: demoting gid to payload saves ~6 ms at the
    # dense bench's 32M rows (scripts/micro_sort.py: 76.8 vs 70.5 ms) but
    # makes equal-(tile, quantized-depth) ties resolve arbitrarily — measured
    # to break the tight-cull bit-identity guarantee (cull on/off renders
    # then differ at tie pixels, tests/test_binning.py). The gid tie-break
    # keeps every A/B in the pipeline bit-exact; round-4 decision: keep it.
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

    if do_cull:
        kept_total = jnp.sum((pair_gid != gid_null).astype(jnp.int32))
        n_culled = n_valid - kept_total
    else:
        kept_total = n_valid
        n_culled = jnp.zeros((), jnp.int32)
    # kept overflow: the kernels then composite a TRUNCATED pair set (tile
    # segments clamped to kept_budget). The rasterizer zeroes that step's
    # gradients via grad_ok, n_dropped reports the overflow, and the driver's
    # adaptive budget regrows (<= a few overflow steps per growth event).
    overflow = kept_total > kept_budget
    n_dropped = n_dropped + jnp.maximum(kept_total - kept_budget, 0)
    n_sat = jnp.zeros((), jnp.int32)

    if do_sat:
        # SATURATION BOUND CULL: cut each tile at the first chunk boundary
        # where the quantized transmittance bound proves the forward kernel
        # early-exits (cum_q * SAT_Q_SCALE > -log2(T_EPS)), then compact the
        # surviving per-tile prefixes into chunk-aligned regions PRESERVING
        # each tile's head offset — the kernels' chunk grid sees identical
        # valid content, so image, nproc, and gradients are bit-identical.
        q_s = gid_s & ((1 << SAT_Q_BITS) - 1)
        if not interpret:
            # one-pass Pallas scan (6-bit quanta are exact in its f32 blocks;
            # XLA's log-pass cumsum decomposition cost ~5 ms at the dense
            # bench's 26M kept pairs)
            from gsplat_tpu.render.scan_pallas import prefix_sum_small

            C = prefix_sum_small(q_s[:kept_budget], interpret=interpret)
        else:
            C = jnp.cumsum(q_s[:kept_budget])        # (kept,) int32 inclusive
        Cprev = jnp.where(starts > 0, C[jnp.maximum(starts - 1, 0)], 0)
        pos = jnp.searchsorted(
            C, Cprev + SAT_CUT, side="left"
        ).astype(jnp.int32)                          # first pair reaching the bound
        astart = (starts // chunk) * chunk
        head = starts - astart
        seg_end = starts + tile_count
        cut = jnp.minimum(
            jnp.where(pos < seg_end,
                      astart + ((pos - astart) // chunk + 1) * chunk, seg_end),
            seg_end,
        )
        new_count = jnp.maximum(cut - starts, 0)
        nch2 = -(-(head + new_count) // chunk)
        region = nch2 * chunk
        rend = jnp.cumsum(region)
        rbase = (rend - region).astype(jnp.int32)
        needed = rend[-1]
        n_sat = needed
        sat_overflow = needed > sat_budget
        # clamp regions into the budget on overflow (overlapping regions are
        # harmless: grad_ok zeroes the gradients and n_dropped reports it)
        rbase = jnp.minimum(rbase, jnp.maximum(sat_budget - region, 0))
        overflow = jnp.logical_or(overflow, sat_overflow)
        n_dropped = n_dropped + jnp.where(
            sat_overflow, needed - sat_budget, 0
        )
        if fused and chunk % 128 == 0:
            # bulk per-tile DMA run copy (compact_pallas): the XLA src-map
            # gather below prices at ~23 ns/row (42 ms at the dense bench's
            # 1.8M survivors — 1-col gathers pay full random-access latency),
            # while the move is really ~3k contiguous chunk-aligned runs
            from gsplat_tpu.render.compact_pallas import compact_runs

            cpr = chunk // 128  # 128-pair rows per chunk
            gid_sat = compact_runs(
                gid_s[:kept_budget], astart // 128, rbase // 128, nch2 * cpr,
                out_size=sat_budget, fill=gid_null, interpret=interpret,
            )
        else:
            # XLA fallback / oracle: src map over the compacted slots,
            # src(o) = o + off[t(o)] with off_t = astart_t - rbase_t,
            # telescoped as scattered deltas + cumsum (repeated bases from
            # empty tiles accumulate their deltas — the telescope stays exact)
            offs = astart - rbase
            delta = jnp.concatenate([offs[:1], offs[1:] - offs[:-1]])
            src_off = jnp.cumsum(
                jnp.zeros((sat_budget,), jnp.int32)
                .at[rbase].add(delta, mode="drop")
            )
            src = jnp.clip(
                jnp.arange(sat_budget, dtype=jnp.int32) + src_off, 0,
                kept_budget - 1,
            )
            gid_sat = gid_s[src]
        gid_s = jax.lax.shift_right_logical(gid_sat, SAT_Q_BITS)
        starts = (rbase + head).astype(jnp.int32)
        tile_count = new_count.astype(jnp.int32)

    return Binning(
        grad_ok=jnp.logical_not(overflow),
        gid_s=gid_s,
        tile_start=starts,
        tile_count=tile_count,
        n_pairs=jnp.minimum(total, pair_budget),
        n_dropped=n_dropped,
        n_culled=n_culled,
        n_sat=n_sat,
    )
