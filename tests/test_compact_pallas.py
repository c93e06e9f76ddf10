"""compact_pallas.compact_runs vs the XLA src-map oracle (binning's fallback)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu.render.compact_pallas import compact_runs


def _oracle(src, astart, rbase, nch, out_size, fill):
    """Reference semantics: per-tile region copy in ascending-t overwrite
    order; uncovered rows = fill."""
    out = np.full(out_size, fill, np.int64)
    for a, r, n in zip(astart, rbase, nch):
        rows = n * 128
        out[r * 128:r * 128 + rows] = src[a * 128:a * 128 + rows]
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_compact_runs_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    T = 37
    nch = rng.integers(0, 40, T).astype(np.int32)  # mix of empty/large tiles
    region = nch * 1  # chunk rows
    rbase = np.concatenate([[0], np.cumsum(region)[:-1]]).astype(np.int32)
    rend = int(np.cumsum(region)[-1])
    out_rows = rend + 24  # uncovered tail
    # source regions: random chunk-aligned, possibly overlapping, in-bounds
    src_rows = 2048
    astart = np.array(
        [rng.integers(0, src_rows - max(int(n), 1) + 1) for n in nch],
        np.int32,
    )
    src = rng.integers(0, 1 << 20, src_rows * 128).astype(np.int32)

    want = _oracle(src, astart, rbase, nch, out_rows * 128, fill=-7)
    got = np.asarray(compact_runs(
        jnp.asarray(src), jnp.asarray(astart), jnp.asarray(rbase),
        jnp.asarray(nch), out_size=out_rows * 128, fill=-7, interpret=True,
    ))
    # covered regions + guaranteed-untouched tail match exactly; the 15 rows
    # after the last region may hold the final DMA block's overhang (the
    # documented over-copy semantics — those rows are never read as segments)
    np.testing.assert_array_equal(got[: rend * 128], want[: rend * 128])
    np.testing.assert_array_equal(
        got[(rend + 16) * 128:], want[(rend + 16) * 128:]
    )


def test_compact_runs_empty_and_full_blocks():
    # exact multiples of the 16-chunk DMA block and zero-pair tiles
    src = jnp.arange(64 * 128, dtype=jnp.int32)
    astart = jnp.asarray([0, 16, 0], jnp.int32)
    rbase = jnp.asarray([0, 32, 48], jnp.int32)
    nch = jnp.asarray([32, 0, 16], jnp.int32)
    out = compact_runs(src, astart, rbase, nch, out_size=80 * 128, fill=-1,
                       interpret=True)
    out = np.asarray(out)
    np.testing.assert_array_equal(out[: 32 * 128], np.arange(32 * 128))
    np.testing.assert_array_equal(
        out[48 * 128:64 * 128], np.arange(16 * 128)
    )
    # rows covered by no region keep the fill
    assert (out[64 * 128:] == -1).all()
    assert (out[32 * 128:48 * 128] == -1).all()
