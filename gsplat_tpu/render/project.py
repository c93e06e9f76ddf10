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

    # Everything below is EXPLICIT elementwise math over (N,) vectors rather than
    # batched (N,4)/(N,3,3) matmuls: XLA lowers tiny batched contractions onto
    # 4-lane-wide MXU tiles (measured ~114ns/Gaussian at 1M on v5e); the expanded
    # scalar forms run on the full-width VPU (and stay exactly f32, no bf16
    # default-precision hazard).
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    FP = cam.full_proj  # row-vector convention (reference camera.cpp:66-71)
    hom = [x * FP[0, j] + y * FP[1, j] + z * FP[2, j] + FP[3, j] for j in range(4)]
    p_w = 1.0 / (hom[3] + 1e-7)
    p_proj = jnp.stack([hom[0] * p_w, hom[1] * p_w, hom[2] * p_w], axis=-1)
    WV = cam.world_view
    p_view = jnp.stack(
        [x * WV[0, j] + y * WV[1, j] + z * WV[2, j] + WV[3, j] for j in range(3)],
        axis=-1,
    )
    depth = p_view[:, 2]

    in_front = depth > 0.2
    live = g.live_mask
    base_mask = in_front & live

    # --- EWA 2D covariance (explicit symmetric-form expansion, VPU-only) ---
    s3 = g.get_scaling() * scaling_modifier
    q = g.get_rotation()
    qr, qi, qj, qk = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    # rotation matrix entries (reference general_utils.cpp:12-40)
    r00 = 1 - 2 * (qj * qj + qk * qk)
    r01 = 2 * (qi * qj - qr * qk)
    r02 = 2 * (qi * qk + qr * qj)
    r10 = 2 * (qi * qj + qr * qk)
    r11 = 1 - 2 * (qi * qi + qk * qk)
    r12 = 2 * (qj * qk - qr * qi)
    r20 = 2 * (qi * qk - qr * qj)
    r21 = 2 * (qj * qk + qr * qi)
    r22 = 1 - 2 * (qi * qi + qj * qj)
    s0sq, s1sq, s2sq = s3[:, 0] ** 2, s3[:, 1] ** 2, s3[:, 2] ** 2
    # Sigma = R diag(s^2) R^T, 6 unique entries
    c00 = r00 * r00 * s0sq + r01 * r01 * s1sq + r02 * r02 * s2sq
    c01 = r00 * r10 * s0sq + r01 * r11 * s1sq + r02 * r12 * s2sq
    c02 = r00 * r20 * s0sq + r01 * r21 * s1sq + r02 * r22 * s2sq
    c11 = r10 * r10 * s0sq + r11 * r11 * s1sq + r12 * r12 * s2sq
    c12 = r10 * r20 * s0sq + r11 * r21 * s1sq + r12 * r22 * s2sq
    c22 = r20 * r20 * s0sq + r21 * r21 * s1sq + r22 * r22 * s2sq

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
    # combined rows of A = J @ W, where W = WV[:3,:3]^T (view rotation) and
    # J = [[fx/z, 0, -fx tx/z^2], [0, fy/z, -fy ty/z^2]]
    W = cam.world_view[:3, :3].T  # (3,3) constant
    j00, j02 = fx * inv_z, -fx * tx * inv_z2
    j11, j12 = fy * inv_z, -fy * ty * inv_z2
    a0 = j00 * W[0, 0] + j02 * W[2, 0]
    a1 = j00 * W[0, 1] + j02 * W[2, 1]
    a2 = j00 * W[0, 2] + j02 * W[2, 2]
    b0 = j11 * W[1, 0] + j12 * W[2, 0]
    b1 = j11 * W[1, 1] + j12 * W[2, 1]
    b2 = j11 * W[1, 2] + j12 * W[2, 2]
    # cov2d = A Sigma A^T with A rows a=(a0,a1,a2), b=(b0,b1,b2)
    sa0 = c00 * a0 + c01 * a1 + c02 * a2
    sa1 = c01 * a0 + c11 * a1 + c12 * a2
    sa2 = c02 * a0 + c12 * a1 + c22 * a2
    sb0 = c00 * b0 + c01 * b1 + c02 * b2
    sb1 = c01 * b0 + c11 * b1 + c12 * b2
    sb2 = c02 * b0 + c12 * b1 + c22 * b2
    a = a0 * sa0 + a1 * sa1 + a2 * sa2 + 0.3
    b = b0 * sa0 + b1 * sa1 + b2 * sa2
    c = b0 * sb0 + b1 * sb1 + b2 * sb2 + 0.3

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
        dirs = dirs * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(dirs * dirs, axis=-1, keepdims=True), 1e-16)
        )
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
