"""GaussianModel state tests: activations, covariance, SH annealing, capacity padding
(reference test bundle: src/scene/gaussian_model.cpp:711-726)."""

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu.core.gaussians import (
    Gaussians,
    create_from_pcd,
    grow_capacity,
    inverse_sigmoid,
)
from gsplat_tpu.core.sh import num_sh_coeffs, rgb2sh, sh2rgb


def _tiny_model(cap=32, n=5, seed=0, max_sh_degree=3):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3))
    cols = rng.random((n, 3))
    return create_from_pcd(pts, cols, capacity=cap, max_sh_degree=max_sh_degree)


def test_create_from_pcd_shapes():
    g = _tiny_model()
    assert g.xyz.shape == (32, 3)
    assert g.f_dc.shape == (32, 3)
    assert g.f_rest.shape == (32, 15, 3)
    assert g.opacity.shape == (32, 1)
    assert int(g.n_live) == 5
    assert g.get_features().shape == (32, 16, 3)
    # opacity activation: sigmoid(logit(0.1)) == 0.1 for live rows
    np.testing.assert_allclose(g.get_opacity()[:5, 0], 0.1, rtol=1e-5)
    # padded rows are inert
    assert float(g.get_opacity()[5:].max()) < 1e-9
    assert float(g.get_scaling()[5:].max()) < 1e-9
    # padded rotations normalize safely
    assert np.all(np.isfinite(np.asarray(g.get_rotation())))


def test_sh_color_roundtrip():
    rgb = jnp.array([[0.2, 0.5, 0.9]])
    np.testing.assert_allclose(sh2rgb(rgb2sh(rgb)), rgb, rtol=1e-6)
    assert num_sh_coeffs(3) == 16


def test_activations_exp_log_inverse():
    g = _tiny_model()
    np.testing.assert_allclose(
        np.log(np.asarray(g.get_scaling()[:5])), np.asarray(g.scaling[:5]), rtol=1e-5
    )
    x = jnp.array([0.1, 0.5, 0.9])
    np.testing.assert_allclose(jax.nn.sigmoid(inverse_sigmoid(x)), x, rtol=1e-5)


def test_covariance_getter():
    g = _tiny_model()
    cov = g.get_covariance()
    assert cov.shape == (32, 6)
    # diag entries of a PSD matrix are non-negative
    assert float(jnp.min(cov[:, [0, 3, 5]])) >= 0


def test_oneup_sh_degree():
    g = _tiny_model()
    assert g.active_sh_degree == 0
    for expected in (1, 2, 3, 3, 3):
        g = g.oneup_sh_degree()
        assert g.active_sh_degree == expected


def test_grow_capacity():
    g = _tiny_model(cap=8, n=5)
    g2 = grow_capacity(g, 16)
    assert g2.capacity == 16
    assert int(g2.n_live) == 5
    np.testing.assert_allclose(g2.xyz[:5], g.xyz[:5])
    assert float(g2.get_opacity()[5:].max()) < 1e-9


def test_pytree_jit():
    g = _tiny_model()

    @jax.jit
    def f(g: Gaussians):
        return g.get_covariance().sum() + g.get_opacity().sum()

    assert np.isfinite(float(f(g)))
