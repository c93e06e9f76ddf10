"""bounds_pallas.segment_ends vs jnp.searchsorted (the XLA fallback)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu.render.bounds_pallas import segment_ends
from gsplat_tpu.render.raster_pallas import KEY_INVALID


@pytest.mark.parametrize("seed,n,p", [(0, 2048, 4096), (1, 1024, 1536),
                                      (2, 4096, 128)])
def test_segment_ends_matches_searchsorted(seed, n, p):
    rng = np.random.default_rng(seed)
    # clustered integer gid keys + a KEY_INVALID tail (masked/pad d-rows)
    n_valid = int(p * 0.8)
    gids = np.sort(rng.integers(0, n, n_valid))
    keys = np.concatenate(
        [gids.astype(np.float32), np.full(p - n_valid, KEY_INVALID, np.float32)]
    )
    want = np.searchsorted(keys, np.arange(1, n + 1).astype(np.float32),
                           side="left")
    got = segment_ends(jnp.asarray(keys), n, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_segment_ends_empty_and_dense_blocks():
    n, p = 1024, 2048
    # every key belongs to gid 7 (single monster segment) — all other gids
    # get boundary positions collapsing to 0 or p
    keys = np.full(p, 7.0, np.float32)
    got = np.asarray(segment_ends(jnp.asarray(keys), n, interpret=True))
    want = np.searchsorted(keys, np.arange(1, n + 1).astype(np.float32),
                           side="left")
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("seed,n,p", [(0, 2048, 4096), (1, 1024, 1536),
                                      (2, 4096, 128)])
def test_segment_sums_matches_cumsum_diff(seed, n, p):
    """segment_sums (VERDICT r4 ask #4) vs the XLA cumsum-table + boundary
    difference it replaces. f32-rounding-level agreement (different but both
    deterministic summation orders; values here are O(1))."""
    from gsplat_tpu.render.bounds_pallas import segment_sums

    rng = np.random.default_rng(seed)
    n_valid = int(p * 0.8)
    gids = np.sort(rng.integers(0, n, n_valid))
    keys = np.concatenate(
        [gids.astype(np.float32), np.full(p - n_valid, KEY_INVALID, np.float32)]
    )
    d16 = rng.normal(size=(16, p)).astype(np.float32)

    # oracle: cumsum table + ends + diff (the render.py table path)
    S = np.concatenate(
        [np.zeros((1, 16), np.float32), np.cumsum(d16.T, axis=0,
                                                  dtype=np.float64)], axis=0)
    ends = np.searchsorted(keys, np.arange(1, n + 1).astype(np.float32),
                           side="left")
    T_b = S[ends]
    want = T_b - np.concatenate([np.zeros((1, 16)), T_b[:-1]], axis=0)

    got = np.asarray(segment_sums(jnp.asarray(keys), jnp.asarray(d16), n,
                                  interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_segment_sums_single_monster_segment():
    from gsplat_tpu.render.bounds_pallas import segment_sums

    n, p = 1024, 2048
    keys = np.full(p, 7.0, np.float32)
    d16 = np.ones((16, p), np.float32)
    got = np.asarray(segment_sums(jnp.asarray(keys), jnp.asarray(d16), n,
                                  interpret=True))
    want = np.zeros((n, 16), np.float32)
    want[7, :] = p
    np.testing.assert_allclose(got, want, rtol=1e-6)
