"""Fused Pallas pair-expansion kernel: per-Gaussian columns -> per-pair
(sort key, Gaussian id) in one pass.

Replaces the round-2 XLA expansion pipeline — the B2 scatter+cumsum
telescoping / dense row gather, the pair-long tile arithmetic, the tight-cull
quadratic, and the key packing — which together cost ~250 ms/step at 42M
pairs @1080p on v5e (scatter 107 + 10-col cumsum 58 + gather/elementwise).

Design (TPU-first; no counterpart in the reference — its rasterizer stage is
absent, SURVEY.md §1 L2.5; upstream CUDA 3DGS does this with duplicateWithKeys
+ global atomics, which TPUs don't have):

- XLA precomputes only the per-micro-block window BASES (one small
  `searchsorted` of the MB_PAIRS-pair block boundaries into the live
  cumulative counts — ~S/MB_PAIRS queries). Because the table is
  live-compacted (every row has >= 1 pair), a K-pair micro-block touches at
  most K+1 consecutive table rows.
- The kernel walks (128,128)-pair blocks; for each MB_PAIRS-pair micro-block
  it DMAs the (NC, WIN) column window starting at the micro-block's base
  Gaussian (128-aligned), resolves each pair's row by a BINARY SEARCH of the
  window's sorted offset column (log2-rounds of 128-lane `dynamic_gather`s —
  replacing the round-3 design's pair-long `gid_c` map, whose segment-start
  marks scatter alone cost 8.8 ms at the sparse bench), and resolves every
  per-pair column value with 128-lane `dynamic_gather`s + selects — no
  scatters, no big sorts, no per-pair HBM gathers.
- Per-pair arithmetic (rect decomposition via an exact reciprocal-multiply
  division, the tight-cull quadratic minimum, key packing) runs on the VPU in
  the same pass.

Outputs feed the unchanged (key, gid) pair sort. Bit-identical to the XLA
path it replaces (integer arithmetic; the cull predicate evaluates the same
f32 expression).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

# Micro-block size (pairs per window DMA + search batch). A micro-block of K
# pairs spans at most K+1 live table rows (every live row owns >= 1 pair) +
# 127 alignment lanes, so WIN = K + 128. Smaller micro-blocks shrink the
# nominal gather-op counts (fewer window chunks, fewer search rounds) but
# MEASURED WORSE on v5e (round 5, dense bench, baseline 47.8 ms at
# MB_ROWS=8): MB_ROWS=2 -> 129 ms — the 4x window count's per-window
# overhead (DMA issue/wait + the 64-micro-block unroll) dwarfs the saved
# gathers, which lower as cheap native 128-lane shuffles. Default stays 8.
MB_ROWS = int(_os.environ.get("GSPLAT_EXPAND_MB", "8"))
assert MB_ROWS in (1, 2, 4, 8), MB_ROWS
MB_PAIRS = MB_ROWS * 128
BLOCK_PAIRS = 16384                        # pairs per grid step (fixed)
N_MICRO = BLOCK_PAIRS // MB_PAIRS
WIN = MB_PAIRS + 128                       # window lanes (multiple of 128)
N_CHUNKS = WIN // 128
# descending power-of-2 search start: reachable counts span [0, 2*START-1],
# which must cover WIN (counts are #{window offsets <= p} <= WIN)
SEARCH_START = 1 << (WIN.bit_length() - 1)
assert 2 * SEARCH_START - 1 >= WIN, (SEARCH_START, WIN)
# window-DMA pipeline depth: the kernel is DMA-LATENCY-bound per micro-block
# (measured round 5: MB=2's 4x window count took the dense expansion 47.8 ->
# 129 ms — ~1 us of un-hidden latency per window at 2 slots). NSLOTS=4 keeps
# 3 windows in flight; VMEM cost NSLOTS * NC * WIN * 4B (~240 KB at 4).
NSLOTS = int(_os.environ.get("GSPLAT_EXPAND_SLOTS", "2"))
assert NSLOTS >= 2, NSLOTS
# SPAN mode (round 5): pairs within a micro-block are MONOTONE in table row,
# so the rows a micro-block touches span exactly [bases[m], bases[m+1]] — on
# dense scenes (~30 pairs/Gaussian) that is 1-2 of the window's 10 chunks.
# The binary-search and column-gather chunk loops then run as DYNAMIC-bound
# `lax.fori_loop`s over [c_lo, c_hi] with dynamic VMEM lane slicing
# (`pl.ds(k*128, 128)` — verified to lower on v5e Mosaic), visiting only the
# span's chunks. Correctness of the skipped chunks: rows BELOW the span
# always satisfy offs <= p (their skipped gather defaults to acc=0 ->
# off_p=0 <= p, the correct "bump"); rows ABOVE it never do (the probe mask
# excludes them via hi_row).
#
# MEASURED AND DEFAULT-OFF (round 5, dense bench, baseline kernel 47.8 ms):
# per-chunk lax.cond guards -> 92.5 ms (Mosaic branches carrying the
# accumulator vreg cost ~2x the skipped work); dynamic fori over the span ->
# 52.9 ms (scalar trip management + dynamic lane slices still beat the
# saved gathers — a static 128-lane take_along_axis is a native shuffle).
# The unconditional static loops win on v5e despite doing ~6x the nominal
# gather work; the lever stays for other TPU generations.
SPAN = _os.environ.get("GSPLAT_EXPAND_SPAN", "0") == "1"


def _f32(x):
    return jax.lax.bitcast_convert_type(x, jnp.float32)


def _gather_cols(win_ref, slot, idx, cid, cols, c_lo, c_hi):
    """Resolve window rows for each pair: win_ref (NSLOTS, NC, WIN) i32 scratch;
    idx/cid (8,128) lane index / chunk id. Returns {col: (8,128) i32}.
    Slicing the ref per (col, chunk) keeps live vregs small — loading the
    whole 80 KB window at once would spill. SPAN mode: chunks outside
    [c_lo, c_hi] cannot be selected (cid lies within the micro-block's row
    span), so ONE dynamic fori over the span gathers all columns per chunk."""
    if SPAN:
        def body(k, accs):
            out = []
            for c, a in zip(cols, accs):
                chunk = jnp.broadcast_to(
                    win_ref[slot, c:c + 1, pl.ds(k * 128, 128)],
                    (MB_ROWS, 128),
                )
                g_k = jnp.take_along_axis(chunk, idx, axis=1)
                out.append(jnp.where(cid == k, g_k, a))
            return tuple(out)

        init = tuple(
            jnp.zeros((MB_ROWS, 128), jnp.int32) for _ in cols
        )
        accs = jax.lax.fori_loop(c_lo, c_hi + 1, body, init)
        return dict(zip(cols, accs))
    out = {}
    for c in cols:
        acc = jnp.zeros((MB_ROWS, 128), jnp.int32)
        for k in range(N_CHUNKS):
            chunk = jnp.broadcast_to(
                win_ref[slot, c:c + 1, 128 * k:128 * (k + 1)], (MB_ROWS, 128)
            )
            g_k = jnp.take_along_axis(chunk, idx, axis=1)
            acc = jnp.where(cid == k, g_k, acc)
        out[c] = acc
    return out


def _expand_kernel(
    meta_ref, bases_ref, cols_hbm, key_ref, gid_ref, win, sems, *,
    tw, tile_size, db, num_tiles, n_orig, n_pad, do_cull, alpha_thresh,
    sat_pack, ncols,
):
    b = pl.program_id(0)
    total = meta_ref[0]
    # column layout (matches _expand_fused): 0 x0y0, 1 w, 2 dq, 3 recip,
    # [4..9 cull: mx my ca cb cc op], then inert pass-through columns
    # (counts rides the row gather), NC-2 gorig, NC-1 off
    col_ids = [0, 1, 2, 3, ncols - 2, ncols - 1]
    if do_cull:
        col_ids += [4, 5, 6, 7, 8, 9]
    off_c = ncols - 1

    max_base = n_pad - WIN

    def win_base(m):
        base = jnp.minimum(jnp.maximum(bases_ref[0, 0, m], 0), max_base)
        return pl.multiple_of((base // 128) * 128, 128)

    def dma(m):
        slot = m % NSLOTS
        return pltpu.make_async_copy(
            cols_hbm.at[:, pl.ds(win_base(m), WIN)], win.at[slot], sems.at[slot]
        )

    # keep NSLOTS-1 window DMAs in flight (latency hiding — see NSLOTS note)
    for m0 in range(min(NSLOTS - 1, N_MICRO)):
        dma(m0).start()
    inv_dq = min(0x7F800000 >> (32 - db), (1 << db) - 1)
    key_invalid = (num_tiles << db) | inv_dq

    for m in range(N_MICRO):
        if m + NSLOTS - 1 < N_MICRO:
            dma(m + NSLOTS - 1).start()
        dma(m).wait()
        base_al = win_base(m)
        slot = m % NSLOTS

        # micro-block row span (SPAN mode): pairs are monotone in table row,
        # so every row this micro-block touches lies in [bases[m],
        # bases[m+1]] (bases row 1 = the next block's base; its tail pad is
        # n_pad, clamping hi_row to the whole window — the safe fallback).
        # Rows BELOW lo_row always satisfy offs <= p (they own earlier
        # pairs); rows ABOVE hi_row never do — both directions are handled
        # without gathering them (see gather_off / the ok mask).
        lo_row = jnp.clip(bases_ref[0, 0, m] - base_al, 0, WIN - 1)
        hi_row = jnp.clip(bases_ref[0, 1, m] - base_al, 0, WIN - 1)
        c_lo = lo_row >> 7
        c_hi = hi_row >> 7

        row = jax.lax.broadcasted_iota(jnp.int32, (MB_ROWS, 128), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (MB_ROWS, 128), 1)
        p = (b * BLOCK_PAIRS + m * MB_ROWS * 128) + row * 128 + lane

        # per-pair row id by BINARY SEARCH of the window's offset column
        # (sorted: live offsets strictly increase, dead rows carry the live
        # total, table padding carries INT32_MAX — binning._expand_fused).
        # count = #{window offs <= p}; the owning row is count - 1. Replaces
        # the precomputed pair-long gid_c map (marks scatter + prefix scan).
        def gather_off(idx_w):
            cid_w = idx_w >> 7
            lidx = idx_w & 127
            if SPAN:
                def body(k, a):
                    chunk = jnp.broadcast_to(
                        win[slot, off_c:off_c + 1, pl.ds(k * 128, 128)],
                        (MB_ROWS, 128),
                    )
                    g_k = jnp.take_along_axis(chunk, lidx, axis=1)
                    return jnp.where(cid_w == k, g_k, a)

                return jax.lax.fori_loop(
                    c_lo, c_hi + 1, body,
                    jnp.zeros((MB_ROWS, 128), jnp.int32),
                )
            acc = jnp.zeros((MB_ROWS, 128), jnp.int32)
            for k in range(N_CHUNKS):
                chunk = jnp.broadcast_to(
                    win[slot, off_c:off_c + 1, 128 * k:128 * (k + 1)],
                    (MB_ROWS, 128),
                )
                g_k = jnp.take_along_axis(chunk, lidx, axis=1)
                acc = jnp.where(cid_w == k, g_k, acc)
            return acc

        count = jnp.zeros((MB_ROWS, 128), jnp.int32)
        # reachable counts lie in [0, 2*SEARCH_START - 1] >= WIN (asserted at
        # module top), covering every count the window can produce
        step = SEARCH_START
        while step >= 1:
            probe = count + step - 1
            # probes past hi_row must NOT bump the count (their rows own
            # later pairs); probes below c_lo*128 read acc=0 -> off_p=0 <= p,
            # the correct "bump" for rows owning earlier pairs
            ok = (probe < WIN) & (probe <= hi_row) if SPAN else (probe < WIN)
            off_p = gather_off(jnp.where(ok, probe, 0))
            count = jnp.where(ok & (off_p <= p), count + step, count)
            step //= 2

        lid = count - 1
        cid = jnp.maximum(lid, 0) >> 7               # arithmetic >> on >= 0
        cid = jnp.where(lid < 0, N_CHUNKS, cid)      # negative -> no chunk
        idx = lid & 127
        cv = _gather_cols(win, slot, idx, cid, col_ids, c_lo, c_hi)

        x0y0 = cv[0]
        w = cv[1]
        local = p - cv[ncols - 1]
        # exact division by the per-Gaussian reciprocal: local < tw*th
        # (~2^14), f32 relative error < 2^-22 => |q_approx - local/w| < 1,
        # one integer correction restores exactness
        q = jnp.floor(local.astype(jnp.float32) * _f32(cv[3])).astype(jnp.int32)
        r0 = local - q * w
        q = q + (r0 >= w).astype(jnp.int32) - (r0 < 0).astype(jnp.int32)
        rem = local - q * w
        tx = (x0y0 & 0xFFFF) + rem
        ty = jax.lax.shift_right_logical(x0y0, 16) + q
        tile = ty * tw + tx
        valid = p < total

        gid_v = cv[ncols - 2]
        gid_null = n_orig
        if do_cull:
            from gsplat_tpu.render.binning import _rect_min_Q

            ts = float(tile_size)
            lx = tx.astype(jnp.float32) * ts - _f32(cv[4])
            ly = ty.astype(jnp.float32) * ts - _f32(cv[5])
            min_q = _rect_min_Q(
                _f32(cv[6]), _f32(cv[7]), _f32(cv[8]),
                lx, lx + (ts - 1.0), ly, ly + (ts - 1.0),
            )
            keep = _f32(cv[9]) * jnp.exp(-min_q) >= alpha_thresh
            vk = valid & keep
            if sat_pack:
                # saturation-bound quantum in the gid low bits (see
                # binning._sat_q; gid stays the leading sort tie-break)
                from gsplat_tpu.render.binning import (
                    SAT_Q_BITS, _rect_max_Q, _sat_q,
                )

                max_q = _rect_max_Q(
                    _f32(cv[6]), _f32(cv[7]), _f32(cv[8]),
                    lx, lx + (ts - 1.0), ly, ly + (ts - 1.0),
                )
                gid_v = (gid_v << SAT_Q_BITS) | _sat_q(_f32(cv[9]), max_q)
                gid_null = n_orig << SAT_Q_BITS
        else:
            vk = valid

        key = jax.lax.shift_left(tile, db) | cv[2]
        sl = slice(MB_ROWS * m, MB_ROWS * (m + 1))
        key_ref[sl, :] = jnp.where(vk, key, key_invalid)
        gid_ref[sl, :] = jnp.where(vk, gid_v, gid_null)


def expand_pairs(
    cols_t: jnp.ndarray,     # (NC, n_pad) int32 live-compacted column table
    bases: jnp.ndarray,      # (ceil(S/MB_PAIRS),) int32 micro-block base rows
    total: jnp.ndarray,      # () int32 live pair count
    S: int,                  # pair slots (multiple of 128)
    *,
    tw: int,
    tile_size: int,
    db: int,
    num_tiles: int,
    n_orig: int,
    do_cull: bool,
    alpha_thresh: float,
    sat_pack: bool = False,
    interpret: bool = False,
):
    """Run the fused expansion kernel. Returns (key, gid) each (S,) int32,
    in expansion order, ready for the pair sort. S must be a multiple of 128
    and n_pad a multiple of 128 with >= WIN slack rows (see build_cols)."""
    assert S % 128 == 0, S
    nc, n_pad = cols_t.shape
    assert n_pad % 128 == 0 and n_pad >= WIN, (n_pad,)
    ncols = nc
    if nc % 8 != 0:
        # DMA sublane dimension must be a multiple of 8 on TPU
        cols_t = jnp.pad(cols_t, ((0, 8 - nc % 8), (0, 0)))
        nc = cols_t.shape[0]
    rows = S // 128
    grid = pl.cdiv(rows, N_MICRO * MB_ROWS)
    # per-micro-block window bases ride as a (grid, 8, 128) VMEM block input:
    # sublane row 0 lane m = bases[m], row 1 lane m = bases[m+1] (the NEXT
    # block's base — the micro-block's row-span upper bound for SPAN mode;
    # the tail pads with n_pad so the last blocks fall back to the full
    # window). The 8-sublane shape is the Mosaic block-divisibility minimum,
    # and SMEM prefetch would cap the grid.
    nmb = grid * N_MICRO
    b_pad = jnp.pad(
        bases.astype(jnp.int32), (0, nmb + 1 - bases.shape[0]),
        constant_values=n_pad,
    )
    bases_blk = jnp.stack(
        [b_pad[:nmb], b_pad[1:nmb + 1]], axis=1
    ).reshape(grid, N_MICRO, 2).transpose(0, 2, 1)
    bases_blk = jnp.pad(bases_blk, ((0, 0), (0, 6), (0, 128 - N_MICRO)))

    kern = functools.partial(
        _expand_kernel, tw=tw, tile_size=tile_size, db=db,
        num_tiles=num_tiles, n_orig=n_orig, n_pad=n_pad, do_cull=do_cull,
        alpha_thresh=alpha_thresh, sat_pack=sat_pack, ncols=ncols,
    )
    blk = (N_MICRO * MB_ROWS, 128)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 8, 128), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(blk, lambda b, *_: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, lambda b, *_: (b, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((NSLOTS, nc, WIN), jnp.int32),
            pltpu.SemaphoreType.DMA((NSLOTS,)),
        ],
    )
    key, gid = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct((rows, 128), jnp.int32),
            jax.ShapeDtypeStruct((rows, 128), jnp.int32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        jnp.asarray(total, jnp.int32).reshape(1),
        bases_blk,
        cols_t,
    )
    return key.reshape(S), gid.reshape(S)
