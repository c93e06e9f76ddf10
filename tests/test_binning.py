"""Tile-binning unit tests: segment tables, expansion maps, ordering invariants
(the structures the Pallas kernels and the gradient reduction rely on)."""

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
    # chunk-aligned segment table is consistent
    starts = np.asarray(b.tile_start)
    chunks = np.asarray(b.tile_chunks)
    assert (chunks * CH >= counts).all()
    ends = starts + chunks * CH
    order = np.argsort(starts)
    for a, bb in zip(order[:-1], order[1:]):
        assert ends[a] <= starts[bb] or chunks[a] == 0 or chunks[bb] == 0


def test_padded_gid_depth_order():
    b = simple_case()
    pg = np.asarray(b.padded_gid)
    starts = np.asarray(b.tile_start)
    counts = np.asarray(b.tile_count)
    n = 3
    for t in range(len(counts)):
        seg = pg[starts[t]: starts[t] + counts[t]]
        assert (seg != n).all()
        # front-to-back: depth must be non-decreasing within the tile
        depth = np.asarray([2.0, 1.0, 3.0])[seg]
        assert (np.diff(depth) >= 0).all()
    # padding slots hold the null Gaussian
    for t in range(len(counts)):
        padseg = pg[starts[t] + counts[t]: starts[t] + np.asarray(b.tile_chunks)[t] * CH]
        assert (padseg == n).all()


def test_expansion_maps_roundtrip():
    b = simple_case()
    pg = np.asarray(b.padded_gid)
    pe = np.asarray(b.padded_eid)
    offsets = np.asarray(b.gauss_offsets)
    cum = np.asarray(b.gauss_cum)
    n = 3
    # every valid padded slot's expansion index maps back to the same Gaussian
    for q in range(len(pg)):
        if pg[q] != n:
            e = pe[q]
            g = np.searchsorted(cum, e, side="right")
            assert g == pg[q]
    # all valid expansion ids appear exactly once
    valid = pe[pg != n]
    assert len(np.unique(valid)) == len(valid) == int(b.n_pairs)


def test_overflow_budget():
    mean2d = jnp.asarray([[32.0, 32.0]] * 10)
    radius = jnp.full((10,), 40.0)   # huge: covers all 16 tiles each
    depth = jnp.arange(10, dtype=jnp.float32)
    b = bin_gaussians(mean2d, radius, depth, width=W, height=H, tile_size=TS,
                      chunk=CH, pair_budget=64)
    assert int(b.n_dropped) == 160 - 64
    assert int(b.n_pairs) == 64
