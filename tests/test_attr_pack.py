"""Packed 8-column attribute table (render(attr_pack=True)).

rgb/opacity ride as bf16 pairs through the gather and the kernels
(raster_pallas.pack_attrs8); geometry stays f32. The image/gradients must
match the classic 16-row path to bf16-quantization tolerance, and the
pack/unpack bit round trip must be EXACT (bf16 is truncated f32, so the
unpacked value is precisely round-to-nearest-even bf16 of the input).
"""

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu.render.render import render
from tests.test_render import tiny_scene

TILE = 16


def test_pack_unpack_roundtrip_exact():
    from gsplat_tpu.render.raster_pallas import (
        _unpack_hi, _unpack_lo, pack_attrs8)

    rng = np.random.default_rng(0)
    attrs = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32))
    packed = pack_attrs8(attrs)
    assert packed.shape == (64, 7)
    np.testing.assert_array_equal(np.asarray(packed[:, :5]),
                                  np.asarray(attrs[:, :5]))
    r = _unpack_hi(packed[:, 5])
    g = _unpack_lo(packed[:, 5])
    b = _unpack_hi(packed[:, 6])
    op = _unpack_lo(packed[:, 6])
    for got, col in ((r, 5), (g, 6), (b, 7), (op, 8)):
        want = attrs[:, col].astype(jnp.bfloat16).astype(jnp.float32)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_render_attr_pack_matches_to_bf16_tolerance():
    g, cam = tiny_scene(n=80, capacity=128)
    bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)
    kw = dict(tile_size=TILE, chunk=8, pair_budget=1 << 12)
    out16 = render(cam, g, bg, attr_pack=False, **kw)
    out8 = render(cam, g, bg, attr_pack=True, **kw)
    # identical binning => identical pair telemetry
    assert int(out16.n_pairs) == int(out8.n_pairs)
    np.testing.assert_allclose(
        np.asarray(out8.image), np.asarray(out16.image), rtol=0, atol=2e-2
    )
    # bf16 rel error is 2^-9; compositing accumulates a few of them
    err = np.abs(np.asarray(out8.image) - np.asarray(out16.image))
    assert float(err.mean()) < 2e-3, float(err.mean())


def test_grads_attr_pack_close():
    g, cam = tiny_scene(n=60)
    bg = jnp.zeros(3, jnp.float32)
    kw = dict(tile_size=TILE, chunk=8, pair_budget=1 << 12)

    def loss(params, pack):
        out = render(cam, g.with_params(params), bg, attr_pack=pack, **kw)
        return jnp.mean(out.image)

    p = g.params()
    g16 = jax.grad(lambda q: loss(q, False))(p)
    g8 = jax.grad(lambda q: loss(q, True))(p)
    for k in g16:
        a, b = np.asarray(g16[k]), np.asarray(g8[k])
        denom = np.abs(a).max() + 1e-8
        assert np.abs(a - b).max() / denom < 2e-2, (
            k, np.abs(a - b).max(), denom)
