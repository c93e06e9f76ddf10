"""Golden-value tests for core math, carried over from the reference's inline
Boost tests (src/utils/general_utils.cpp:147-343, src/utils/graphics_utils.cpp:80-135,
src/scene/gaussian_model.cpp:409-453)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu.core.transforms import (
    build_rotation,
    build_scaling_rotation,
    covariance_from_scaling_rotation,
    focal2fov,
    fov2focal,
    get_expon_lr_func,
    get_projection_matrix,
    get_world2view,
    get_world2view_2,
    strip_symmetric,
)


def test_build_rotation_permutation():
    # quaternion (.5,.5,.5,.5) -> cyclic permutation matrix (reference golden,
    # general_utils.cpp:147-187)
    q = jnp.array([[0.5, 0.5, 0.5, 0.5]])
    R = build_rotation(q)[0]
    expected = np.array([[0, 0, 1], [1, 0, 0], [0, 1, 0]], dtype=np.float32)
    np.testing.assert_allclose(R, expected, atol=1e-6)


def test_build_rotation_identity():
    q = jnp.array([[1.0, 0, 0, 0], [2.0, 0, 0, 0]])  # non-unit must be normalized
    R = build_rotation(q)
    np.testing.assert_allclose(R, np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-6)


def test_build_scaling_rotation():
    q = jnp.array([[1.0, 0, 0, 0]])
    s = jnp.array([[1.0, 2.0, 3.0]])
    L = build_scaling_rotation(s, q)[0]
    np.testing.assert_allclose(L, np.diag([1.0, 2.0, 3.0]), atol=1e-6)


def test_strip_symmetric():
    M = jnp.arange(9, dtype=jnp.float32).reshape(1, 3, 3)
    out = strip_symmetric(M)[0]
    np.testing.assert_allclose(out, [0, 1, 2, 4, 5, 8])


def test_covariance_isotropic():
    # isotropic scale 0.5 -> diag 0.25 (reference golden, gaussian_model.cpp:409-453)
    s = jnp.full((1, 3), 0.5)
    q = jnp.array([[1.0, 0, 0, 0]])
    cov = covariance_from_scaling_rotation(s, 1.0, q)[0]
    np.testing.assert_allclose(cov, [0.25, 0, 0, 0.25, 0, 0.25], atol=1e-6)


def test_world2view_golden():
    # reference src/utils/graphics_utils.cpp:81-98
    R = np.array([[1.0, 2.0, 0.0], [0.0, 1.0, 2.0], [0.0, 0.0, 1.0]])
    t = np.array([1.0, 2.0, 3.0])
    Rt = get_world2view(R, t)
    assert Rt[0, 0] == 1.0 and Rt[1, 1] == 1.0 and Rt[2, 2] == 1.0 and Rt[3, 3] == 1.0
    assert Rt[0, 3] == 1.0 and Rt[1, 0] == 2.0 and Rt[1, 3] == 2.0
    assert Rt[2, 1] == 2.0 and Rt[2, 3] == 3.0


def test_world2view_2_golden():
    # reference src/utils/graphics_utils.cpp:100-118
    R = np.array([[1.0, 2.0, 0.0], [0.0, 1.0, 2.0], [0.0, 0.0, 1.0]])
    t = np.array([1.0, 2.0, 3.0])
    Rt = get_world2view_2(R, t, np.array([1.0, 1.0, 1.0]), 1.0)
    np.testing.assert_allclose(Rt[1, 0], 2.0, atol=1e-12)
    np.testing.assert_allclose(Rt[1, 3], -1.0, atol=1e-12)
    np.testing.assert_allclose(Rt[2, 1], 2.0, atol=1e-12)


def test_projection_matrix_golden():
    # reference src/utils/graphics_utils.cpp:120-135
    P = get_projection_matrix(1.0, 10.0, math.pi / 2, math.pi / 2)
    np.testing.assert_allclose(P[0, 0], 1.0, rtol=1e-6)
    np.testing.assert_allclose(P[1, 1], 1.0, rtol=1e-6)
    assert P[0, 2] == 0.0 and P[1, 2] == 0.0 and P[3, 2] == 1.0
    np.testing.assert_allclose(P[2, 2], 10.0 / 9, rtol=1e-6)
    np.testing.assert_allclose(P[2, 3], -10.0 / 9, rtol=1e-6)


def test_focal_fov_roundtrip():
    fov = focal2fov(600.0, 800)
    np.testing.assert_allclose(fov2focal(fov, 800), 600.0, rtol=1e-9)
    np.testing.assert_allclose(fov, 2 * math.atan(800 / 1200.0))


def test_expon_lr_schedule():
    # reference src/utils/general_utils.cpp:112-142 semantics
    f = get_expon_lr_func(1.6e-4, 1.6e-6, 0, 0.01, 30_000)
    np.testing.assert_allclose(float(f(0)), 1.6e-4, rtol=1e-5)
    np.testing.assert_allclose(float(f(30_000)), 1.6e-6, rtol=1e-5)
    np.testing.assert_allclose(float(f(60_000)), 1.6e-6, rtol=1e-5)  # clamped
    np.testing.assert_allclose(float(f(15_000)), math.sqrt(1.6e-4 * 1.6e-6), rtol=1e-4)
    assert float(f(-1)) == 0.0
    # delay ramp
    g = get_expon_lr_func(1.0, 1.0, lr_delay_steps=100, lr_delay_mult=0.5, max_steps=100)
    np.testing.assert_allclose(float(g(0)), 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(g(100)), 1.0, rtol=1e-6)


def test_expon_lr_traced():
    import jax

    f = get_expon_lr_func(1.6e-4, 1.6e-6, 0, 0.01, 30_000)
    out = jax.jit(f)(jnp.asarray(100))
    assert np.isfinite(float(out))
