"""Parity: the fused Pallas pair-expansion kernel must reproduce the XLA
expansion bit-for-bit — (key, gid) per pair in expansion order — across
regimes (gather/B2), cull on/off, budgets, and edge cases (overflow, empty
scenes, dead-Gaussian clusters)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu.render.binning import (
    _expand_fused,
    _expand_xla,
    bin_gaussians,
    tile_grid,
    tile_rects,
)


def make_scene(n, seed, width=256, height=192, tile_size=16, dead_frac=0.3,
               clustered_dead=False):
    rng = np.random.default_rng(seed)
    mean2d = rng.uniform(-40, max(width, height) + 40, (n, 2)).astype(np.float32)
    radius = rng.uniform(1, 60, n).astype(np.float32)
    dead = rng.random(n) < dead_frac
    if clustered_dead:
        dead[: n // 2] = True  # a long dead prefix (worst case for windows)
    radius[dead] = 0.0
    depth = rng.uniform(0.1, 50, n).astype(np.float32)
    conic = np.abs(rng.normal(0.02, 0.05, (n, 3))).astype(np.float32)
    conic[:, 1] *= 0.1
    opacity = rng.uniform(0.001, 1.0, n).astype(np.float32)
    return mean2d, radius, depth, conic, opacity


def both_paths(n, seed, pair_budget, do_cull, sat_pack=False, **scene_kw):
    width, height, tile_size = 256, 192, 16
    mean2d, radius, depth, conic, opacity = make_scene(n, seed, **scene_kw)
    tw, th = tile_grid(width, height, tile_size)
    num_tiles = tw * th
    x0, y0, x1, y1 = tile_rects(
        jnp.asarray(mean2d), jnp.asarray(radius), tw, th, tile_size
    )
    rect_w = jnp.maximum(x1 - x0, 0)
    rect_h = jnp.maximum(y1 - y0, 0)
    counts = jnp.where(jnp.asarray(radius) > 0, rect_w * rect_h, 0).astype(jnp.int32)
    cum = jnp.cumsum(counts)
    total = cum[-1]
    offsets = cum - counts
    args = (jnp.asarray(mean2d), jnp.asarray(depth), x0, y0, rect_w, counts)
    cull = (jnp.asarray(conic), jnp.asarray(opacity)) if do_cull else (None, None)
    kw = dict(n=n, tw=tw, num_tiles=num_tiles, tile_size=tile_size,
              pair_budget=pair_budget, do_cull=do_cull, sat_pack=sat_pack)
    key_x, gid_x = jax.jit(
        lambda: _expand_xla(*args[:6], cum, offsets, total, *cull, **kw)
    )()
    key_f, gid_f = jax.jit(
        lambda: _expand_fused(*args[:6], total, *cull, interpret=True, **kw)
    )()
    return map(np.asarray, (key_x, gid_x, key_f, gid_f))


@pytest.mark.parametrize("do_cull", [False, True])
@pytest.mark.parametrize("n,budget,seed", [
    (300, 4096, 0),       # gather regime (budget < 8n)
    (100, 8192, 1),       # B2 regime (budget >= 8n)
    (500, 2048, 2),       # heavy overflow (total >> budget)
])
def test_fused_matches_xla(n, budget, seed, do_cull):
    key_x, gid_x, key_f, gid_f = both_paths(n, seed, budget, do_cull)
    np.testing.assert_array_equal(key_x, key_f)
    np.testing.assert_array_equal(gid_x, gid_f)


@pytest.mark.parametrize("n,budget,seed", [
    (300, 4096, 0),
    (100, 8192, 1),
])
def test_fused_matches_xla_sat_pack(n, budget, seed):
    """sat_pack: the 6 quantized saturation-bound bits under the gid must be
    bit-identical between the kernel and the XLA oracle (both evaluate the
    same f32 corner-max quadratic + log1p expression)."""
    key_x, gid_x, key_f, gid_f = both_paths(n, seed, budget, True,
                                            sat_pack=True)
    np.testing.assert_array_equal(key_x, key_f)
    np.testing.assert_array_equal(gid_x, gid_f)
    # the packed q bits are actually populated somewhere
    assert (np.asarray(gid_x) & 63).max() > 0


def test_fused_dead_cluster():
    """A long dead prefix stresses the live-compaction + window bound."""
    key_x, gid_x, key_f, gid_f = both_paths(
        400, 3, 4096, True, clustered_dead=True
    )
    np.testing.assert_array_equal(gid_f, gid_x)
    np.testing.assert_array_equal(key_f, key_x)


def test_fused_empty_scene():
    key_x, gid_x, key_f, gid_f = both_paths(64, 4, 1024, False, dead_frac=1.0)
    np.testing.assert_array_equal(gid_f, gid_x)
    np.testing.assert_array_equal(key_f, key_x)


def test_bin_gaussians_fused_vs_fallback():
    """End-to-end Binning equality: the same scene binned at a fused-path
    budget and through the XLA fallback (non-128-multiple budget is forced by
    monkeypatching the gate) must agree on every table."""
    width, height, tile_size, chunk = 256, 192, 16, 8
    mean2d, radius, depth, conic, opacity = make_scene(300, 5)
    kw = dict(width=width, height=height, tile_size=tile_size, chunk=chunk,
              pair_budget=4096, cull_conic=jnp.asarray(conic),
              cull_opacity=jnp.asarray(opacity), kept_budget=2048,
              fused=True)  # force: interpret mode defaults to the XLA path
    b_fused = bin_gaussians(jnp.asarray(mean2d), jnp.asarray(radius),
                            jnp.asarray(depth), **kw)

    import gsplat_tpu.render.binning as binning_mod
    orig = binning_mod._expand_fused
    try:
        def forced_xla(mean2d_, depth_, x0, y0, rect_w, counts, total,
                       cc, co, *, n, tw, num_tiles, tile_size, pair_budget,
                       do_cull, sat_pack=False, interpret):
            cum = jnp.cumsum(counts)
            offsets = cum - counts
            return binning_mod._expand_xla(
                mean2d_, depth_, x0, y0, rect_w, counts, cum, offsets, total,
                cc, co, n=n, tw=tw, num_tiles=num_tiles, tile_size=tile_size,
                pair_budget=pair_budget, do_cull=do_cull, sat_pack=sat_pack)

        binning_mod._expand_fused = forced_xla
        b_xla = bin_gaussians(jnp.asarray(mean2d), jnp.asarray(radius),
                              jnp.asarray(depth), **kw)
    finally:
        binning_mod._expand_fused = orig

    for name in b_fused._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(b_fused, name)), np.asarray(getattr(b_xla, name)),
            err_msg=name,
        )
    assert int(b_fused.n_culled) > 0


def test_fused_matches_xla_small_microblocks():
    """GSPLAT_EXPAND_MB=2 (the round-5 window-shrink lever) must stay
    bit-identical to the XLA oracle. Runs in a subprocess: the micro-block
    constants freeze at import."""
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "jax.config.update('jax_compilation_cache_dir','/tmp/jax_cache_tests');"
        "jax.config.update('jax_persistent_cache_min_compile_time_secs',0.0);"
        "jax.config.update('jax_persistent_cache_min_entry_size_bytes',0);"
        "import sys; sys.path[:0]=[%r,%r];"
        "from gsplat_tpu.render import expand_pallas as ep;"
        "assert ep.MB_ROWS == 2 and ep.WIN == 384, (ep.MB_ROWS, ep.WIN);"
        "from test_expand_pallas import both_paths;"
        "import numpy as np;"
        "k1,g1,k2,g2 = both_paths(400, 3, 4096, True, sat_pack=True);"
        "np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2));"
        "np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2));"
        "print('MB2 parity OK')"
    ) % (str(repo), str(repo / "tests"))
    import os

    env = dict(os.environ, GSPLAT_EXPAND_MB="2")
    p = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=900,
                       cwd=str(repo))
    assert p.returncode == 0 and "MB2 parity OK" in p.stdout, (
        p.stdout[-2000:], p.stderr[-3000:])
