"""Math utilities: quaternion/scale geometry and camera matrices.

Semantics match the reference's L0 layer so its golden unit-test values carry over:
- build_rotation / build_scaling_rotation / strip_symmetric:
  reference src/utils/general_utils.cpp:12-99
- focal2fov / get_world2view / get_world2view_2 / get_projection_matrix:
  reference src/utils/graphics_utils.cpp:4-72
- get_expon_lr_func: reference src/utils/general_utils.cpp:112-142

Everything is pure jnp, batched, float32, autodiff-able; no per-element Python loops.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def build_rotation(q: jnp.ndarray) -> jnp.ndarray:
    """Normalized quaternion (N,4) [w,x,y,z] -> rotation matrices (N,3,3).

    Reference: src/utils/general_utils.cpp:12-40.
    """
    # clamped-rsqrt normalization: linalg.norm's VJP is singular at 0
    q = q * jax.lax.rsqrt(jnp.maximum(jnp.sum(q * q, axis=-1, keepdims=True), 1e-12))
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def build_scaling_rotation(s: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """L = R(q) @ diag(s): (N,3),(N,4) -> (N,3,3).

    Reference: src/utils/general_utils.cpp:88-99.
    """
    R = build_rotation(q)
    return R * s[..., None, :]


def strip_symmetric(sym: jnp.ndarray) -> jnp.ndarray:
    """(N,3,3) symmetric -> (N,6) upper triangle [xx, xy, xz, yy, yz, zz].

    Reference: src/utils/general_utils.cpp:49-76.
    """
    return jnp.stack(
        [
            sym[..., 0, 0],
            sym[..., 0, 1],
            sym[..., 0, 2],
            sym[..., 1, 1],
            sym[..., 1, 2],
            sym[..., 2, 2],
        ],
        axis=-1,
    )


def covariance_from_scaling_rotation(
    scaling: jnp.ndarray, scaling_modifier: float, rotation: jnp.ndarray
) -> jnp.ndarray:
    """Sigma = L L^T stripped to (N,6); L = R diag(s*mod).

    Reference: src/scene/gaussian_model.cpp:18-28.
    """
    L = build_scaling_rotation(scaling * scaling_modifier, rotation)
    return strip_symmetric(
        jnp.matmul(L, jnp.swapaxes(L, -1, -2), precision="highest")
    )


def get_expon_lr_func(
    lr_init: float,
    lr_final: float,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
    max_steps: int = 1_000_000,
):
    """Log-lerp LR schedule with optional sine delay ramp; callable on traced steps.

    Reference: src/utils/general_utils.cpp:112-142.
    """

    def helper(step):
        step_f = jnp.asarray(step, jnp.float32)
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step_f / lr_delay_steps, 0.0, 1.0)
            )
        else:
            delay_rate = 1.0
        t = jnp.clip(step_f / max_steps, 0.0, 1.0)
        log_lerp = jnp.exp(math.log(lr_init) * (1 - t) + math.log(lr_final) * t)
        out = delay_rate * log_lerp
        # reference returns 0 for step<0 (and for all-zero lr endpoints)
        if lr_init == 0.0 and lr_final == 0.0:
            return jnp.zeros_like(out)
        return jnp.where(step_f < 0, 0.0, out)

    return helper


def focal2fov(focal: float, pixels: float) -> float:
    """Reference: src/utils/graphics_utils.cpp:4-7."""
    return 2.0 * math.atan(pixels / (2.0 * focal))


def fov2focal(fov: float, pixels: float) -> float:
    """Inverse of focal2fov (absent in the reference; needed by the Blender loader)."""
    return pixels / (2.0 * math.tan(fov / 2.0))


def get_world2view(R: np.ndarray, t: np.ndarray) -> np.ndarray:
    """World->view 4x4: top-left R^T, last column t.

    Reference: src/utils/graphics_utils.cpp:10-29 (R is camera->world rotation).
    """
    Rt = np.zeros((4, 4), dtype=np.float64)
    Rt[:3, :3] = np.asarray(R).T
    Rt[:3, 3] = np.asarray(t)
    Rt[3, 3] = 1.0
    return Rt


def get_world2view_2(
    R: np.ndarray,
    t: np.ndarray,
    translate: np.ndarray = np.zeros(3),
    scale: float = 1.0,
) -> np.ndarray:
    """World->view with camera-center translate/scale applied.

    Reference: src/utils/graphics_utils.cpp:32-43.
    """
    Rt = get_world2view(R, t)
    C2W = np.linalg.inv(Rt)
    cam_center = (C2W[:3, 3] + np.asarray(translate)) * scale
    C2W[:3, 3] = cam_center
    return np.linalg.inv(C2W)


def get_projection_matrix(znear: float, zfar: float, fovx: float, fovy: float) -> np.ndarray:
    """OpenGL-style perspective projection (z_sign=+1).

    Reference: src/utils/graphics_utils.cpp:46-72.
    """
    tan_half_fovy = math.tan(fovy / 2)
    tan_half_fovx = math.tan(fovx / 2)
    top = tan_half_fovy * znear
    right = tan_half_fovx * znear
    bottom, left = -top, -right
    P = np.zeros((4, 4), dtype=np.float64)
    P[0, 0] = 2.0 * znear / (right - left)
    P[1, 1] = 2.0 * znear / (top - bottom)
    P[0, 2] = (right + left) / (right - left)
    P[1, 2] = (top + bottom) / (top - bottom)
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P
