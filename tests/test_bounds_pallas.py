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
