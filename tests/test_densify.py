"""Densification tests: clone/split/prune/reset-opacity on padded arrays
(upstream gaussian_model.py semantics; absent in the reference, SURVEY.md §2)."""

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu.core.gaussians import create_from_pcd, inverse_sigmoid
from gsplat_tpu.train.densify import (
    add_densification_stats,
    densify_and_prune,
    reset_opacity,
)
from gsplat_tpu.train.optim import init_adam_state


def scene(n=8, capacity=32, seed=0):
    rng = np.random.default_rng(seed)
    g = create_from_pcd(rng.normal(size=(n, 3)), rng.random((n, 3)), capacity=capacity)
    opt = init_adam_state(g.params())
    return g, opt


def test_stats_accumulation():
    g, _ = scene()
    grads = jnp.ones((g.capacity, 2), jnp.float32) * 0.01
    radii = jnp.where(jnp.arange(g.capacity) < 4, 5.0, 0.0)
    g2 = add_densification_stats(g, grads, radii, width=100, height=100)
    # visible rows got norm(0.01*50, 0.01*50) added; invisible untouched
    expect = np.hypot(0.5, 0.5)
    np.testing.assert_allclose(np.asarray(g2.xyz_gradient_accum[:4]), expect, rtol=1e-5)
    assert float(g2.xyz_gradient_accum[5]) == 0.0
    np.testing.assert_allclose(np.asarray(g2.denom[:4]), 1.0)
    np.testing.assert_allclose(np.asarray(g2.max_radii2D[:4]), 5.0)


def test_clone_small_high_grad():
    g, opt = scene()
    n0 = int(g.n_live)
    # mark row 0 as high-gradient; all rows are small (scale from knn is small)
    g = g.replace(
        xyz_gradient_accum=jnp.zeros(g.capacity).at[0].set(1.0),
        denom=jnp.zeros(g.capacity).at[0].set(1.0),
    )
    g2, opt2, dropped = densify_and_prune(
        g, opt, jax.random.PRNGKey(0),
        max_grad=0.5, min_opacity=0.001, extent=1000.0,  # threshold 10 >> knn scales
        max_screen_size=0.0, percent_dense=0.01,
    )
    assert int(dropped) == 0
    assert int(g2.n_live) == n0 + 1  # one clone appended
    # the clone duplicates row 0's position
    tail = np.asarray(g2.xyz[n0])
    np.testing.assert_allclose(tail, np.asarray(g.xyz[0]), atol=1e-6)
    # accumulators reset
    assert float(jnp.sum(g2.xyz_gradient_accum)) == 0.0


def test_split_large_high_grad():
    g, opt = scene()
    n0 = int(g.n_live)
    big_scale = jnp.log(5.0)
    g = g.replace(
        scaling=jnp.where(g.live_mask[:, None], big_scale, g.scaling),
        xyz_gradient_accum=jnp.zeros(g.capacity).at[1].set(1.0),
        denom=jnp.zeros(g.capacity).at[1].set(1.0),
    )
    g2, opt2, dropped = densify_and_prune(
        g, opt, jax.random.PRNGKey(0),
        max_grad=0.5, min_opacity=0.001, extent=1.0,  # percent_dense*extent=0.01 << 5
        max_screen_size=0.0, percent_dense=0.01,
    )
    # split: source pruned, 2 samples appended -> net +1
    assert int(g2.n_live) == n0 + 1
    # new scaling = log(5/1.6)
    new_scales = np.exp(np.asarray(g2.scaling[n0 - 1 : n0 + 1]))
    np.testing.assert_allclose(new_scales, 5.0 / 1.6, rtol=1e-5)


def test_prune_low_opacity():
    g, opt = scene()
    n0 = int(g.n_live)
    op = g.opacity.at[2].set(inverse_sigmoid(jnp.asarray([[0.001]]))[0])
    g = g.replace(opacity=op)
    g2, _, _ = densify_and_prune(
        g, opt, jax.random.PRNGKey(0),
        max_grad=9e9, min_opacity=0.005, extent=100.0,
        max_screen_size=0.0, percent_dense=0.01,
    )
    assert int(g2.n_live) == n0 - 1
    # survivors keep a live prefix; pad rows are inert
    assert bool(jnp.all(g2.live_mask[: n0 - 1]))
    assert float(jax.nn.sigmoid(g2.opacity[n0 - 1 :]).max()) < 1e-6


def test_optimizer_state_surgery():
    """Surviving rows carry Adam moments; new rows start at zero."""
    g, opt = scene()
    n0 = int(g.n_live)
    mu = {k: v + 7.0 for k, v in opt.mu.items()}
    opt = opt.replace(mu=mu)
    g = g.replace(
        xyz_gradient_accum=jnp.zeros(g.capacity).at[0].set(1.0),
        denom=jnp.zeros(g.capacity).at[0].set(1.0),
    )
    g2, opt2, _ = densify_and_prune(
        g, opt, jax.random.PRNGKey(0),
        max_grad=0.5, min_opacity=0.001, extent=1000.0,
        max_screen_size=0.0, percent_dense=0.01,
    )
    assert np.allclose(np.asarray(opt2.mu["xyz"][:n0]), 7.0)   # kept rows
    assert np.allclose(np.asarray(opt2.mu["xyz"][n0]), 0.0)    # cloned row zeroed


def test_reset_opacity():
    g, opt = scene()
    g = g.replace(opacity=jnp.where(g.live_mask[:, None], 5.0, g.opacity))
    nu = {k: v + 3.0 for k, v in opt.nu.items()}
    opt = opt.replace(nu=nu)
    g2, opt2 = reset_opacity(g, opt)
    n0 = int(g.n_live)
    assert float(jax.nn.sigmoid(g2.opacity[:n0]).max()) <= 0.0100001
    assert float(jnp.abs(opt2.nu["opacity"]).max()) == 0.0
    assert float(jnp.abs(opt2.nu["xyz"] - 3.0).max()) == 0.0  # other groups untouched


def test_capacity_overflow_reported():
    g, opt = scene(n=8, capacity=9)
    g = g.replace(
        xyz_gradient_accum=jnp.ones(g.capacity),
        denom=jnp.ones(g.capacity),
    )
    g2, _, dropped = densify_and_prune(
        g, opt, jax.random.PRNGKey(0),
        max_grad=0.0001, min_opacity=0.001, extent=100.0,
        max_screen_size=0.0, percent_dense=0.01,
    )
    assert int(dropped) > 0
    assert int(g2.n_live) == g.capacity


def test_densify_jits():
    g, opt = scene()
    f = jax.jit(
        lambda g, o, k: densify_and_prune(
            g, o, k, max_grad=0.5, min_opacity=0.005, extent=1.0,
            max_screen_size=20.0, percent_dense=0.01,
        )
    )
    g2, o2, d = f(g, opt, jax.random.PRNGKey(1))
    assert g2.xyz.shape == g.xyz.shape
