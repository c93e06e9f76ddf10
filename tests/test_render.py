"""Rasterizer parity tests: Pallas tile kernels vs the pure-jnp oracle.

SURVEY.md §4 lesson (2): 'numerical parity tests of the Pallas rasterizer fwd/bwd
against a reference implementation (pure-jnp per-pixel compositor + jax.grad)'.
On CPU the kernels run in Pallas interpreter mode — same code path the TPU
compiles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu.core.camera import make_camera
from gsplat_tpu.core.gaussians import create_from_pcd
from gsplat_tpu.render.render import render, render_reference
from gsplat_tpu.train.loss import l1_loss
from tests.fixtures import look_at_rig

W, H = 64, 48
TILE = 16
CHUNK = 32
BUDGET = 1 << 12


def tiny_scene(n=50, seed=0, capacity=64):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)) * 0.5
    cols = rng.random((n, 3))
    g = create_from_pcd(pts, cols, capacity=capacity)
    R, T = look_at_rig(3)[0]
    cam = make_camera(R, T, fovx=0.9, fovy=0.7, width=W, height=H)
    return g, cam


def do_render(g, cam, bg):
    return render(cam, g, bg, tile_size=TILE, chunk=CHUNK, pair_budget=BUDGET)


def test_forward_matches_oracle():
    g, cam = tiny_scene()
    bg = jnp.zeros(3)
    out = do_render(g, cam, bg)
    ref = render_reference(cam, g, bg, tile_size=TILE)
    assert int(out.n_dropped) == 0
    assert int(out.n_pairs) > 0
    np.testing.assert_allclose(np.asarray(out.image), np.asarray(ref), atol=2e-5)


def test_forward_white_background():
    g, cam = tiny_scene(seed=3)
    bg = jnp.ones(3)
    out = do_render(g, cam, bg)
    ref = render_reference(cam, g, bg, tile_size=TILE)
    np.testing.assert_allclose(np.asarray(out.image), np.asarray(ref), atol=2e-5)
    # background shows through where nothing splats
    assert float(np.asarray(out.transmittance).max()) > 0.9


def test_empty_scene_renders_background():
    g, cam = tiny_scene()
    g = g.replace(n_live=jnp.asarray(0, jnp.int32))
    bg = jnp.asarray([0.2, 0.4, 0.6])
    out = do_render(g, cam, bg)
    np.testing.assert_allclose(
        np.asarray(out.image), np.broadcast_to(np.array([0.2, 0.4, 0.6]), (H, W, 3)),
        atol=1e-6,
    )


def test_gradients_match_oracle():
    """Grads through the Pallas custom VJP vs autodiff of the per-pixel oracle,
    w.r.t. every Gaussian parameter group + the screen-space offset."""
    g, cam = tiny_scene(n=30, seed=1)
    bg = jnp.asarray([0.1, 0.2, 0.3])
    target = jnp.asarray(
        np.random.default_rng(7).random((H, W, 3)), jnp.float32
    )

    def loss_pallas(params, off):
        out = render(
            cam, g.with_params(params), bg,
            tile_size=TILE, chunk=CHUNK, pair_budget=BUDGET, mean2d_offset=off,
        )
        return l1_loss(out.image, target)

    def loss_ref(params, off):
        img = render_reference(
            cam, g.with_params(params), bg, tile_size=TILE, mean2d_offset=off
        )
        return l1_loss(img, target)

    params = g.params()
    off = jnp.zeros((g.capacity, 2), jnp.float32)
    gp, gp_off = jax.grad(loss_pallas, argnums=(0, 1))(params, off)
    gr, gr_off = jax.grad(loss_ref, argnums=(0, 1))(params, off)

    for k in params:
        scale = max(float(jnp.abs(gr[k]).max()), 1e-8)
        np.testing.assert_allclose(
            np.asarray(gp[k]), np.asarray(gr[k]), atol=2e-4 * scale + 1e-9,
            err_msg=f"grad mismatch for {k}",
        )
    scale = max(float(jnp.abs(gr_off).max()), 1e-8)
    np.testing.assert_allclose(
        np.asarray(gp_off), np.asarray(gr_off), atol=2e-4 * scale + 1e-9
    )
    # the screen-space grad is the densification signal: must be nonzero
    assert float(jnp.abs(gp_off).max()) > 0


def test_depth_ordering():
    """A nearer opaque Gaussian must occlude a farther one."""
    pts = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 1.5]])  # second is closer to cam at z~4
    cols = np.array([[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    g = create_from_pcd(pts, cols, capacity=4)
    # crank opacity to ~1 and sizes up
    g = g.replace(
        opacity=jnp.full_like(g.opacity, 8.0),
        scaling=jnp.where(g.live_mask[:, None], jnp.log(0.3), g.scaling),
    )
    R, T = look_at_rig(1, radius=4.0)[0]
    cam = make_camera(R, T, fovx=0.9, fovy=0.7, width=W, height=H)
    out = do_render(g, cam, jnp.zeros(3))
    center = np.asarray(out.image)[H // 2, W // 2]
    assert center[2] > 0.5 and center[0] < 0.3  # blue (near) wins over red (far)


def test_budget_overflow_reported():
    g, cam = tiny_scene(n=50)
    out = render(cam, g, jnp.zeros(3), tile_size=TILE, chunk=8, pair_budget=64)
    assert int(out.n_dropped) > 0


def test_cumsum0_block_width_equivalence(monkeypatch):
    """The in-kernel triangular-matmul cumsum must compute the same prefix sums
    at every block width (GSPLAT_CUMSUM_SUB is a pure MXU-pass-count lever;
    sub=128 was measured faster on v5e, sub=32 is the MAC-model optimum)."""
    from gsplat_tpu.render.raster_pallas import _cumsum0

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(128, 257)).astype(np.float32))
    ref = jnp.cumsum(x, axis=0)
    outs = []
    for sub in ("32", "64", "128"):
        monkeypatch.setenv("GSPLAT_CUMSUM_SUB", sub)
        out = _cumsum0(x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-4)
        outs.append(np.asarray(out))
    np.testing.assert_allclose(outs[0], outs[2], rtol=2e-5, atol=2e-4)
