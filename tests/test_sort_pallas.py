"""Pallas merge sort vs jax.lax.sort (interpret mode; unique keys so the
tie-order freedom of both unstable sorts cannot mask a real mismatch)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu.render.sort_pallas import BASE, sort_with_payload


@pytest.mark.parametrize("S,kdt,n_pay,seed", [
    (BASE, np.float32, 2, 0),          # single base block
    (2 * BASE, np.float32, 1, 1),      # one merge round
    (3 * BASE, np.int32, 1, 2),        # odd run count (copy-through pair)
    (2 * BASE + 1000, np.float32, 2, 3),  # padded tail
])
def test_sort_matches_lax(S, kdt, n_pay, seed):
    rng = np.random.default_rng(seed)
    if kdt == np.float32:
        key = rng.permutation(S).astype(np.float32) * 0.5
    else:
        key = rng.permutation(S).astype(np.int32)
    pays = [
        rng.standard_normal(S).astype(np.float32) if kdt == np.float32
        else rng.integers(0, 1 << 20, S).astype(np.int32)
        for _ in range(n_pay)
    ]
    ops = tuple(jnp.asarray(a) for a in (key, *pays))
    got = jax.jit(lambda o: sort_with_payload(o, interpret=True))(ops)
    want = jax.lax.sort(ops, num_keys=1, is_stable=False)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_sort_groups_duplicate_keys():
    """With duplicate keys the ORDER within a group is free, but each key's
    payload multiset must be preserved (the gradient-reduction contract)."""
    rng = np.random.default_rng(7)
    S = 2 * BASE
    key = rng.integers(0, 50, S).astype(np.float32)
    pay = rng.standard_normal(S).astype(np.float32)
    k_s, p_s = jax.jit(
        lambda o: sort_with_payload(o, interpret=True)
    )((jnp.asarray(key), jnp.asarray(pay)))
    k_s, p_s = np.asarray(k_s), np.asarray(p_s)
    assert (np.diff(k_s) >= 0).all()
    for v in np.unique(key):
        got = np.sort(p_s[k_s == v])
        want = np.sort(pay[key == v])
        np.testing.assert_array_equal(got, want)
