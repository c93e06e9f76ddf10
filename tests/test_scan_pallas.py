"""scan_pallas.prefix_sum_small vs jnp.cumsum (bit-exact for values <= 255)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu.render.scan_pallas import prefix_sum_small


@pytest.mark.parametrize("seed,n,hi", [(0, 128 * 64, 1), (1, 128 * 64 * 3, 63),
                                       (2, 128 * 130, 255)])
def test_prefix_sum_small_exact(seed, n, hi):
    rng = np.random.default_rng(seed)
    x = rng.integers(0, hi + 1, n).astype(np.int32)
    got = np.asarray(prefix_sum_small(jnp.asarray(x), interpret=True))
    np.testing.assert_array_equal(got, np.cumsum(x))


def test_prefix_sum_small_bias_clip_and_fallback():
    x = np.array([0, 1, 1, 0, 1], np.int32)  # tiny -> jnp.cumsum fallback
    got = np.asarray(prefix_sum_small(jnp.asarray(x), bias=-1, clip_hi=1,
                                      interpret=True))
    np.testing.assert_array_equal(got, np.clip(np.cumsum(x) - 1, 0, 1))
