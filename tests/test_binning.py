"""Tile-binning unit tests: segment tables, sorted-order invariants, backward
output-region layout (the structures the Pallas kernels and the gradient
reduction rely on)."""

import jax.numpy as jnp
import numpy as np

from gsplat_tpu.render.binning import bin_gaussians, tile_grid, tile_rects

W, H, TS, CH = 64, 64, 16, 8  # 4x4 tile grid


def simple_case():
    # 3 Gaussians: one in tile (0,0), one spanning 2x2 tiles, one culled
    mean2d = jnp.asarray([[8.0, 8.0], [30.0, 30.0], [50.0, 50.0]])
    radius = jnp.asarray([4.0, 10.0, 0.0])
    depth = jnp.asarray([2.0, 1.0, 3.0])
    return bin_gaussians(
        mean2d, radius, depth, width=W, height=H, tile_size=TS,
        chunk=CH, pair_budget=64,
    )


def test_counts_and_segments():
    b = simple_case()
    tw, th = tile_grid(W, H, TS)
    assert int(b.n_pairs) == 1 + 4  # 1 tile + 2x2 tiles
    assert int(b.n_dropped) == 0
    counts = np.asarray(b.tile_count)
    # recompute expectations precisely from tile_rects
    x0, y0, x1, y1 = tile_rects(
        jnp.asarray([[8.0, 8.0], [30.0, 30.0], [50.0, 50.0]]),
        jnp.asarray([4.0, 10.0, 0.0]), tw, th, TS,
    )
    exp = np.zeros(tw * th, np.int32)
    for g in range(2):
        for ty in range(int(y0[g]), int(y1[g])):
            for tx in range(int(x0[g]), int(x1[g])):
                exp[ty * tw + tx] += 1
    np.testing.assert_array_equal(counts, exp)
    # compact segments tile [0, total) contiguously in tile order
    starts = np.asarray(b.tile_start)
    ends = starts + counts
    live = counts > 0
    assert starts[0] == 0 or not live[0]
    for t in range(1, len(counts)):
        assert starts[t] == ends[t - 1] or starts[t] >= ends[t - 1]


def test_sorted_gid_depth_order():
    b = simple_case()
    gid = np.asarray(b.gid_s)
    starts = np.asarray(b.tile_start)
    counts = np.asarray(b.tile_count)
    n = 3
    for t in range(len(counts)):
        seg = gid[starts[t]: starts[t] + counts[t]]
        assert (seg != n).all()
        # front-to-back: depth must be non-decreasing within the tile
        depth = np.asarray([2.0, 1.0, 3.0])[seg]
        assert (np.diff(depth) >= 0).all()
    # tail beyond the live total holds the null Gaussian
    assert (gid[int(b.n_pairs):] == n).all()


def test_out_regions_disjoint_and_sized():
    b = simple_case()
    starts = np.asarray(b.tile_start)
    counts = np.asarray(b.tile_count)
    out = np.asarray(b.out_start)
    head = starts % CH
    nch = -(-(head + counts) // CH)
    # aligned, disjoint, covering exactly the chunk count each tile sweeps
    assert (out % CH == 0).all()
    end = out + nch * CH
    for t in range(1, len(out)):
        assert out[t] == end[t - 1]
    # per-Gaussian cumsum table matches the segment totals
    assert int(np.asarray(b.gauss_cum)[-1]) == int(b.n_pairs)


def test_overflow_budget():
    mean2d = jnp.asarray([[32.0, 32.0]] * 10)
    radius = jnp.full((10,), 40.0)   # huge: covers all 16 tiles each
    depth = jnp.arange(10, dtype=jnp.float32)
    b = bin_gaussians(mean2d, radius, depth, width=W, height=H, tile_size=TS,
                      chunk=CH, pair_budget=64)
    assert int(b.n_dropped) == 160 - 64
    assert int(b.n_pairs) == 64
