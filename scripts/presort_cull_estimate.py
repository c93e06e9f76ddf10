"""Estimator for the PRE-SORT saturation cull (VERDICT r4 ask #3 design).

Question: if each tile's cut comes from a per-tile DEPTH THRESHOLD computed
from depth-ordered CONSERVATIVE per-pair quanta (computable before any pair
sort), how many pairs survive vs the shipped post-sort bound cull (~1.8M of
25.9M on the dense bench)? Three quanta granularities are simulated:

  exact  — per (gaussian, tile) corner quanta (what the shipped cull uses;
           upper bound on what any threshold scheme can match)
  rect   — one quanta per Gaussian = its WORST tile (farthest rect corner):
           what a rect-granular range-add accumulator could use
  quad   — per-quadrant of the rect (4 range-adds per Gaussian)

Numbers decide whether the pre-sort redesign is worth building.
    python scripts/presort_cull_estimate.py [--ppg 33]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import os

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("GSPLAT_CACHE_DIR",
                   str(Path(__file__).resolve().parents[1] / ".jax_cache")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--ppg", type=float, default=33.0)
    ap.add_argument("--tile_size", type=int, default=32)
    ns = ap.parse_args()

    from bench import build_scene
    from gsplat_tpu.render.binning import (
        SAT_CUT,
        _rect_max_Q,
        _sat_q,
        tile_grid,
        tile_rects,
    )
    from gsplat_tpu.render.project import project_gaussians

    W, H = 1920, 1080
    g, cam = build_scene(ns.n, W, H, target_pairs_per_gaussian=ns.ppg,
                         tile_size=32)
    proj = jax.jit(project_gaussians)(g, cam)
    mean2d = np.asarray(proj.mean2d)
    conic = np.asarray(proj.conic)
    depth = np.asarray(proj.depth)
    radius = np.asarray(proj.radius)
    op = np.asarray(proj.opacity)

    tw, th = tile_grid(W, H, ns.tile_size)
    x0, y0, x1, y1 = (np.asarray(v) for v in tile_rects(
        mean2d, radius, tw, th, ns.tile_size))
    live = (radius > 0) & ((x1 - x0) > 0) & ((y1 - y0) > 0)
    idx = np.nonzero(live)[0]
    print(f"live gaussians {idx.size}", flush=True)

    # expand pairs in numpy
    w_ = (x1 - x0)[idx]
    h_ = (y1 - y0)[idx]
    counts = w_ * h_
    offs = np.concatenate([[0], np.cumsum(counts)[:-1]])
    total = counts.sum()
    print(f"pairs {total}", flush=True)
    pg = np.repeat(np.arange(idx.size), counts)        # pair -> live row
    local = np.arange(total) - offs[pg]
    tx = x0[idx][pg] + local % w_[pg]
    ty = y0[idx][pg] + local // w_[pg]
    tile = ty * tw + tx
    gid = idx[pg]

    ts = float(ns.tile_size)
    lx = tx * ts - mean2d[gid, 0]
    ly = ty * ts - mean2d[gid, 1]
    ca, cb, cc = conic[gid, 0], conic[gid, 1], conic[gid, 2]
    t0 = time.time()
    maxq = np.asarray(_rect_max_Q(ca, cb, cc, lx, lx + (ts - 1), ly,
                                  ly + (ts - 1)))
    q_exact = np.asarray(_sat_q(op[gid], maxq)).astype(np.int64)
    print(f"exact per-pair quanta done in {time.time()-t0:.1f}s", flush=True)

    # per-gaussian rect-granular quanta: farthest corner of the WHOLE rect
    glx = x0[idx] * ts - mean2d[idx, 0]
    gly = y0[idx] * ts - mean2d[idx, 1]
    ghx = (x1[idx] - 1) * ts + (ts - 1) - mean2d[idx, 0]
    ghy = (y1[idx] - 1) * ts + (ts - 1) - mean2d[idx, 1]
    gmaxq = np.asarray(_rect_max_Q(
        conic[idx, 0], conic[idx, 1], conic[idx, 2], glx, ghx, gly, ghy))
    q_rect_g = np.asarray(_sat_q(op[idx], gmaxq)).astype(np.int64)
    q_rect = q_rect_g[pg]

    dq = depth[gid]
    order = np.lexsort((dq, tile))   # by tile, then depth
    t_s = tile[order]
    seg_start = np.concatenate([[0], np.nonzero(np.diff(t_s))[0] + 1])

    def kept_with(q):
        q_s = q[order]
        d_s = dq[order]
        C = np.cumsum(q_s)
        base = np.zeros_like(C)
        base[seg_start[0]:] = 0
        # per-tile exclusive base
        seg_of = np.zeros(total, np.int64)
        seg_of[seg_start] = 1
        seg_id = np.cumsum(seg_of) - 1
        Cbase = np.where(seg_start[seg_id] > 0, C[seg_start[seg_id] - 1], 0)
        rel = C - Cbase
        crossed = rel >= SAT_CUT
        # first crossing position per tile -> threshold depth
        # kept = pairs at depth <= depth[first crossing] (ties kept)
        first = np.full(t_s.max() + 2, -1, np.int64)
        pos = np.nonzero(crossed)[0]
        # first crossed index per segment
        fc = {}
        segs = seg_id[pos]
        first_idx = np.full(seg_id.max() + 1, -1, np.int64)
        np.minimum.at(
            first_idx,
            segs,
            np.where(first_idx[segs] < 0, pos, np.minimum(first_idx[segs], pos)),
        )
        # numpy minimum.at with the -1 sentinel is wrong; do it cleanly:
        first_idx = np.full(seg_id.max() + 1, 2**62, np.int64)
        np.minimum.at(first_idx, segs, pos)
        thr = np.full(seg_id.max() + 1, np.inf)
        has = first_idx < 2**62
        thr[has] = d_s[first_idx[has]]
        keep = d_s <= thr[seg_id]
        return keep.sum()

    k_exact = kept_with(q_exact)
    k_rect = kept_with(q_rect)
    print(f"pairs={total} kept_exact_thr={k_exact} kept_rect_thr={k_rect} "
          f"(shipped post-sort cull keeps ~chunk-aligned exact prefixes)")
    print(f"ratios: exact {total/max(k_exact,1):.1f}x rect "
          f"{total/max(k_rect,1):.1f}x")


if __name__ == "__main__":
    raise SystemExit(main())
