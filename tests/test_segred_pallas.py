"""Parity of the Pallas segmented gradient reduction vs the cumsum-diff oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu.render.raster_pallas import ATTR_DIM, KEY_INVALID
from gsplat_tpu.render.segred_pallas import GB, IDROW, PC, segment_sum_sorted


def _oracle(d_t, cum):
    """The XLA path this kernel replaces: 16-col cumsum + boundary gather + diff."""
    d = d_t.T  # (P, 16)
    S = jnp.concatenate([jnp.zeros((1, ATTR_DIM), d.dtype),
                         jnp.cumsum(d, axis=0)], axis=0)
    T_b = S[cum]
    return T_b - jnp.concatenate([jnp.zeros((1, ATTR_DIM), T_b.dtype),
                                  T_b[:-1]], axis=0)


def _ids_from_cum(cum, p):
    """Per-pair Gaussian id in segment order; KEY_INVALID past the last segment."""
    ids = np.full(p, KEY_INVALID, np.float32)
    prev = 0
    for g, c in enumerate(cum):
        ids[prev:c] = float(g)
        prev = c
    return ids


def _case(seed, n, p, *, empties=0.3, overflow=False):
    rng = np.random.default_rng(seed)
    counts = rng.poisson(p // max(n, 1) + 1, n)
    counts[rng.random(n) < empties] = 0
    cum = np.minimum(np.cumsum(counts), p).astype(np.int32)
    if overflow:
        cum = np.zeros(n, np.int32)  # binning's kept-overflow semantics
    d = rng.normal(size=(ATTR_DIM, p)).astype(np.float32)
    d[10:] = 0.0
    d[IDROW] = _ids_from_cum(cum, p)
    # rows past the last segment end are sort-tail garbage the kernel must
    # never touch (their id row is KEY_INVALID); poison the data rows there
    d[:IDROW, int(cum[-1]):] = 1e30
    return jnp.asarray(d), jnp.asarray(cum)


@pytest.mark.parametrize("seed,n,p", [(0, 256, 1024), (1, 512, 4096),
                                      (2, 128, 512)])
def test_segment_sum_matches_cumsum_diff(seed, n, p):
    d, cum = _case(seed, n, p)
    got = segment_sum_sorted(d, cum, interpret=True)
    valid = jnp.arange(p) < int(cum[-1])
    want = _oracle(jnp.where(valid, d, 0.0), cum)
    np.testing.assert_allclose(np.asarray(got)[:, :9], np.asarray(want)[:, :9],
                               rtol=2e-6, atol=1e-5)
    assert np.all(np.asarray(got)[:, 10:] == 0.0)


def test_empty_and_overflow():
    d, cum = _case(3, 256, 1024, overflow=True)
    got = segment_sum_sorted(d, cum, interpret=True)
    assert np.all(np.asarray(got) == 0.0)


def test_single_giant_segment():
    # one Gaussian owns every pair; the rest are empty
    p, n = 2048, 128
    rng = np.random.default_rng(4)
    d = rng.normal(size=(ATTR_DIM, p)).astype(np.float32)
    d[IDROW] = 0.0
    d = jnp.asarray(d)
    cum = jnp.full((n,), p, jnp.int32)
    got = segment_sum_sorted(d, cum, interpret=True)
    np.testing.assert_allclose(np.asarray(got)[0, :9],
                               np.asarray(jnp.sum(d[:9], axis=1)),
                               rtol=2e-6, atol=1e-4)
    assert np.all(np.asarray(got)[1:] == 0.0)
