"""segsum_pallas.segment_sums vs the XLA cumsum/boundary-difference chain."""

import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu.render.raster_pallas import KEY_INVALID
from gsplat_tpu.render.segsum_pallas import N_VALS, OUT_DIM, segment_sums


def _oracle(keys, vals, n):
    out = np.zeros((n, OUT_DIM), np.float64)
    for i, v in enumerate(vals):
        m = keys < n
        np.add.at(out[:, i], keys[m].astype(np.int64), v[m].astype(np.float64))
    return out


@pytest.mark.parametrize("seed,n,p", [(0, 2048, 4096), (1, 1024, 1536),
                                      (2, 4096, 128)])
def test_segment_sums_matches_oracle(seed, n, p):
    rng = np.random.default_rng(seed)
    n_valid = int(p * 0.8)
    gids = np.sort(rng.integers(0, n, n_valid))
    keys = np.concatenate(
        [gids.astype(np.float32), np.full(p - n_valid, KEY_INVALID, np.float32)]
    )
    vals = [rng.normal(size=p).astype(np.float32) for _ in range(N_VALS)]
    want = _oracle(keys, vals, n)
    got = np.asarray(segment_sums(
        jnp.asarray(keys), [jnp.asarray(v) for v in vals], n, interpret=True
    ))
    assert got.shape == (n, OUT_DIM)
    np.testing.assert_allclose(got[:, :N_VALS], want[:, :N_VALS],
                               rtol=2e-6, atol=1e-5)
    np.testing.assert_array_equal(got[:, N_VALS:], 0.0)


def test_segment_sums_single_monster_segment():
    n, p = 1024, 2048
    keys = np.full(p, 7.0, np.float32)
    vals = [np.full(p, float(i + 1), np.float32) for i in range(N_VALS)]
    got = np.asarray(segment_sums(
        jnp.asarray(keys), [jnp.asarray(v) for v in vals], n, interpret=True
    ))
    want = np.zeros((n, N_VALS), np.float32)
    want[7] = [(i + 1) * p for i in range(N_VALS)]
    np.testing.assert_allclose(got[:, :N_VALS], want, rtol=1e-6)


def test_segment_sums_empty_input_region():
    # all keys KEY_INVALID -> all sums zero
    n, p = 1024, 1024
    keys = np.full(p, KEY_INVALID, np.float32)
    vals = [np.ones(p, np.float32) for _ in range(N_VALS)]
    got = np.asarray(segment_sums(
        jnp.asarray(keys), [jnp.asarray(v) for v in vals], n, interpret=True
    ))
    np.testing.assert_array_equal(got, 0.0)
