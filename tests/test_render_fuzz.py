"""Property-style fuzz: Pallas pipeline vs the per-pixel oracle across random
image sizes, tile sizes, chunk sizes, and Gaussian populations (incl. degenerate
radii, off-screen splats, and non-tile-multiple resolutions)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu.core.camera import make_camera
from gsplat_tpu.core.gaussians import create_from_pcd
from gsplat_tpu.render.render import render, render_reference
from tests.fixtures import look_at_rig


CASES = [
    # (W, H, tile, chunk, n, seed)
    (40, 40, 16, 8, 20, 0),       # non-multiple resolution
    (96, 64, 32, 16, 60, 1),      # tile 32
    (33, 17, 16, 8, 30, 2),       # odd sizes
    (64, 64, 16, 32, 1, 3),       # single Gaussian
    (64, 64, 16, 8, 120, 4),      # dense overlap
    (160, 96, 64, 16, 80, 5),     # tile 64 (dense-regime production knob)
]


@pytest.mark.parametrize("W,H,tile,chunk,n,seed", CASES)
def test_fuzz_forward_parity(W, H, tile, chunk, n, seed):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)) * rng.uniform(0.2, 1.2)
    cols = rng.random((n, 3))
    cap = 1 << int(np.ceil(np.log2(max(n, 2))))
    g = create_from_pcd(pts, cols, capacity=cap)
    # randomize opacity/scale including extremes
    op = rng.uniform(-4, 6, (cap, 1)).astype(np.float32)
    sc = rng.uniform(-4, 0.2, (cap, 3)).astype(np.float32)
    g = g.replace(
        opacity=jnp.where(g.live_mask[:, None], jnp.asarray(op), g.opacity),
        scaling=jnp.where(g.live_mask[:, None], jnp.asarray(sc), g.scaling),
    )
    R, T = look_at_rig(5, radius=float(rng.uniform(2.5, 5.0)))[seed % 5]
    cam = make_camera(R, T, fovx=float(rng.uniform(0.5, 1.3)),
                      fovy=float(rng.uniform(0.5, 1.3)), width=W, height=H)
    bg = jnp.asarray(rng.random(3), jnp.float32)

    out = render(cam, g, bg, tile_size=tile, chunk=chunk, pair_budget=1 << 14)
    ref = render_reference(cam, g, bg, tile_size=tile)
    # tolerance grows with tile size: tile-local pixel coords reach `tile` so
    # the bilinear-form cancellation error scales with it (still ~1e-4 abs)
    np.testing.assert_allclose(
        np.asarray(out.image), np.asarray(ref), atol=3e-5 * max(tile // 16, 1)
    )
    # transmittance sane
    tr = np.asarray(out.transmittance)
    assert (tr >= -1e-6).all() and (tr <= 1 + 1e-6).all()


def test_all_gaussians_behind_camera():
    rng = np.random.default_rng(9)
    g = create_from_pcd(rng.normal(size=(10, 3)) + np.array([0, 0, 100.0]),
                        rng.random((10, 3)), capacity=16)
    R, T = look_at_rig(1)[0]
    # camera at z=4 looking at origin; gaussians at z=100 are far but in front —
    # instead place them far BEHIND by flipping
    g = g.replace(xyz=g.xyz - jnp.asarray([0.0, 0.0, 200.0]))
    cam = make_camera(R, T, fovx=0.9, fovy=0.7, width=32, height=32)
    bg = jnp.asarray([0.5, 0.25, 0.125])
    out = render(cam, g, bg, tile_size=16, chunk=8, pair_budget=256)
    img = np.asarray(out.image)
    # nothing renders (either culled or off-screen): bg everywhere OR tiny alpha
    ref = np.asarray(render_reference(cam, g, bg, tile_size=16))
    np.testing.assert_allclose(img, ref, atol=3e-5)


def test_zero_quaternion_rows_do_not_poison_gradients():
    """linalg.norm's VJP is singular at 0: an all-zero quaternion row (user data
    or a buggy pad) must yield finite gradients everywhere."""
    from gsplat_tpu.train.loss import l1_loss

    rng = np.random.default_rng(11)
    g = create_from_pcd(rng.normal(size=(12, 3)) * 0.5, rng.random((12, 3)),
                        capacity=16)
    g = g.replace(rotation=g.rotation.at[3].set(0.0))
    R, T = look_at_rig(1)[0]
    cam = make_camera(R, T, fovx=0.9, fovy=0.7, width=48, height=32)
    bg = jnp.zeros(3)
    target = jnp.asarray(rng.random((32, 48, 3)), jnp.float32)

    def loss_fn(params):
        out = render(cam, g.with_params(params), bg, tile_size=16, chunk=8,
                     pair_budget=1 << 10)
        return l1_loss(out.image, target)

    gr = jax.grad(loss_fn)(g.params())
    for k, v in gr.items():
        assert not bool(jnp.isnan(v).any()), k
