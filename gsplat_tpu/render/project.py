"""Gaussian projection: frustum culling, EWA 3D->2D covariance, SH->RGB, tile extents.

The reference has no renderer (SURVEY.md §0 'absent entirely'); semantics follow the
upstream 3DGS CUDA preprocess stage so trained scenes are interchangeable:
- perspective projection through the precomputed (transposed) full_proj matrix,
- near-plane cull at view z <= 0.2,
- EWA splatting Jacobian with the 1.3*tan_fov frustum clamp and +0.3 low-pass on the
  2D covariance diagonal,
- radius = ceil(3 * sqrt(max eigenvalue)), conic = inverse 2D covariance,
- ndc2pix(v, S) = ((v+1)*S - 1) * 0.5.

Everything is batched jnp over the padded Gaussian arrays — autodiff supplies the
backward pass (the hot rasterization loop, which autodiff cannot do efficiently,
lives in render/raster_pallas.py with a hand-written VJP).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gsplat_tpu.core.camera import Camera
from gsplat_tpu.core.gaussians import Gaussians
from gsplat_tpu.core.sh import sh_to_rgb_color
from gsplat_tpu.core.transforms import build_scaling_rotation


class Projection(NamedTuple):
    mean2d: jnp.ndarray   # (N,2) pixel coords
    conic: jnp.ndarray    # (N,3) inverse 2D covariance (a,b,c)
    depth: jnp.ndarray    # (N,) view-space z
    radius: jnp.ndarray   # (N,) float pixel radius (0 = culled), stop-gradient
    rgb: jnp.ndarray      # (N,3) SH-evaluated color (>=0)
    opacity: jnp.ndarray  # (N,) activated opacity in (0,1)
    visible: jnp.ndarray  # (N,) bool: radius > 0


def compute_cov3d(scaling: jnp.ndarray, rotation: jnp.ndarray, modifier: float = 1.0):
    """(N,3),(N,4) -> full symmetric (N,3,3). Reference covariance semantics
    (src/scene/gaussian_model.cpp:18-28) kept in matrix form for the EWA chain."""
    L = build_scaling_rotation(scaling * modifier, rotation)
    return jnp.matmul(L, jnp.swapaxes(L, -1, -2), precision="highest")


def ndc2pix(v: jnp.ndarray, size: int) -> jnp.ndarray:
    return ((v + 1.0) * size - 1.0) * 0.5


def project_gaussians(
    g: Gaussians,
    cam: Camera,
    scaling_modifier: float = 1.0,
    override_color: Optional[jnp.ndarray] = None,
    mean2d_offset: Optional[jnp.ndarray] = None,
) -> Projection:
    """Project all (capacity-padded) Gaussians into camera `cam`.

    mean2d_offset: optional (N,2) zeros whose gradient captures the screen-space
    position gradient used by densification (upstream's screenspace_points trick).
    """
    xyz = g.get_xyz()
    n = xyz.shape[0]
    ones = jnp.ones((n, 1), xyz.dtype)
    xyz_h = jnp.concatenate([xyz, ones], axis=-1)

    # row-vector convention: x_clip = [x,1] @ full_proj (reference camera.cpp:66-71).
    # precision='highest' throughout: TPU matmuls default to bf16 inputs, which
    # costs ~3 decimal digits of screen-space position — fatal for training.
    hp = lambda a, b: jnp.matmul(a, b, precision="highest")
    p_hom = hp(xyz_h, cam.full_proj)
    p_w = 1.0 / (p_hom[:, 3] + 1e-7)
    p_proj = p_hom[:, :3] * p_w[:, None]
    p_view = hp(xyz_h, cam.world_view)
    depth = p_view[:, 2]

    in_front = depth > 0.2
    live = g.live_mask
    base_mask = in_front & live

    # --- EWA 2D covariance ---
    cov3d = compute_cov3d(g.get_scaling(), g.get_rotation(), scaling_modifier)
    fx, fy = cam.focal_x, cam.focal_y
    limx = 1.3 * cam.tan_fovx
    limy = 1.3 * cam.tan_fovy
    z_safe = jnp.where(base_mask, depth, 1.0)
    txtz = jnp.clip(p_view[:, 0] / z_safe, -limx, limx)
    tytz = jnp.clip(p_view[:, 1] / z_safe, -limy, limy)
    tx = txtz * z_safe
    ty = tytz * z_safe

    inv_z = 1.0 / z_safe
    inv_z2 = inv_z * inv_z
    zeros = jnp.zeros_like(depth)
    # J: d(pixel-projection)/d(view) 2x3 rows
    J = jnp.stack(
        [
            jnp.stack([fx * inv_z, zeros, -fx * tx * inv_z2], axis=-1),
            jnp.stack([zeros, fy * inv_z, -fy * ty * inv_z2], axis=-1),
        ],
        axis=-2,
    )  # (N,2,3)
    # view rotation: x_view = x_world @ WV[:3,:3] => R_wv = WV[:3,:3]^T
    R_wv = cam.world_view[:3, :3].T
    cov_view = hp(hp(R_wv, cov3d), R_wv.T)
    cov2d = hp(hp(J, cov_view), jnp.swapaxes(J, -1, -2))  # (N,2,2)
    a = cov2d[:, 0, 0] + 0.3
    b = cov2d[:, 0, 1]
    c = cov2d[:, 1, 1] + 0.3

    det = a * c - b * b
    det_ok = det > 0.0
    det_safe = jnp.where(det_ok, det, 1.0)
    inv_det = 1.0 / det_safe
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)

    mid = 0.5 * (a + c)
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det_safe))
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, 0.0)))
    visible = base_mask & det_ok
    radius = jax.lax.stop_gradient(jnp.where(visible, radius, 0.0))

    mean2d = jnp.stack(
        [ndc2pix(p_proj[:, 0], cam.width), ndc2pix(p_proj[:, 1], cam.height)], axis=-1
    )
    if mean2d_offset is not None:
        mean2d = mean2d + mean2d_offset

    # --- color ---
    if override_color is not None:
        rgb = override_color
    else:
        dirs = xyz - cam.cam_center[None, :]
        dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
        rgb = sh_to_rgb_color(g.active_sh_degree, g.get_features(), dirs)

    opacity = jnp.where(visible, g.get_opacity()[:, 0], 0.0)
    return Projection(
        mean2d=mean2d,
        conic=conic,
        depth=depth,
        radius=radius,
        rgb=rgb,
        opacity=opacity,
        visible=visible,
    )
