"""The Gaussian model state: a struct-of-arrays pytree in HBM.

Reference: src/scene/gaussian_model.{h,cpp} — parameter container (xyz, features_dc,
features_rest, scaling, rotation, opacity + densification accumulators,
gaussian_model.h:9-40), activations (scaling=exp/log, opacity=sigmoid/logit,
rotation=L2-normalize, covariance=R.S.(R.S)^T, gaussian_model.cpp:54-59,18-28),
SH-degree annealing (:307-313). `create_from_pcd` is absent in the reference
(SURVEY.md §2) and implemented here per upstream semantics.

TPU-first design decisions (no reference equivalent):
- arrays are **capacity-padded to a static size** with a live-count scalar, so
  densify/prune run under jit with static shapes (SURVEY.md §7 hard part 3);
- dead/padded rows are inert by construction: opacity logit -30 (alpha ~ 0),
  log-scale -30 (radius 0 => never binned), identity quaternion (normalization-safe).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from gsplat_tpu.core.sh import num_sh_coeffs, rgb2sh
from gsplat_tpu.core.transforms import covariance_from_scaling_rotation

PAD_OPACITY_LOGIT = -30.0
PAD_LOG_SCALE = -30.0

# the six optimized leaves, in upstream's parameter-group order
PARAM_KEYS = ("xyz", "f_dc", "f_rest", "opacity", "scaling", "rotation")


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


@struct.dataclass
class Gaussians:
    """Parameters (raw/pre-activation) + densification accumulators.

    Shapes (CAP = static capacity, M = (max_sh_degree+1)^2 - 1):
      xyz (CAP,3) | f_dc (CAP,3) | f_rest (CAP,M,3) | opacity (CAP,1)
      scaling (CAP,3) log | rotation (CAP,4)
      max_radii2D (CAP,) | xyz_gradient_accum (CAP,) | denom (CAP,)
      n_live () int32
    """

    xyz: jnp.ndarray
    f_dc: jnp.ndarray
    f_rest: jnp.ndarray
    opacity: jnp.ndarray
    scaling: jnp.ndarray
    rotation: jnp.ndarray
    max_radii2D: jnp.ndarray
    xyz_gradient_accum: jnp.ndarray
    denom: jnp.ndarray
    n_live: jnp.ndarray
    active_sh_degree: int = struct.field(pytree_node=False, default=0)
    max_sh_degree: int = struct.field(pytree_node=False, default=3)
    spatial_lr_scale: float = struct.field(pytree_node=False, default=1.0)

    # ---- activated getters (reference gaussian_model.cpp:270-304) ----
    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def live_mask(self) -> jnp.ndarray:
        return jnp.arange(self.capacity) < self.n_live

    def get_scaling(self) -> jnp.ndarray:
        return jnp.exp(self.scaling)

    def get_rotation(self) -> jnp.ndarray:
        # normalize via clamped rsqrt: jnp.linalg.norm's VJP divides by the
        # primal norm BEFORE any downstream clamp, so an all-zero quaternion row
        # poisons gradients with 0/0 (eps semantics follow upstream
        # torch.nn.functional.normalize)
        sq = jnp.sum(self.rotation * self.rotation, axis=-1, keepdims=True)
        return self.rotation * jax.lax.rsqrt(jnp.maximum(sq, 1e-12))

    def get_xyz(self) -> jnp.ndarray:
        return self.xyz

    def get_features(self) -> jnp.ndarray:
        """cat(dc, rest) along SH-coeff dim -> (CAP, K, 3); reference :291."""
        return jnp.concatenate([self.f_dc[:, None, :], self.f_rest], axis=1)

    def get_opacity(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.opacity)

    def get_covariance(self, scaling_modifier: float = 1.0) -> jnp.ndarray:
        return covariance_from_scaling_rotation(
            self.get_scaling(), scaling_modifier, self.get_rotation()
        )

    def params(self) -> Dict[str, jnp.ndarray]:
        return {k: getattr(self, k) for k in PARAM_KEYS}

    def with_params(self, params: Dict[str, jnp.ndarray]) -> "Gaussians":
        return self.replace(**params)

    def oneup_sh_degree(self) -> "Gaussians":
        """Reference gaussian_model.cpp:307-313 (static field: bump outside jit)."""
        if self.active_sh_degree < self.max_sh_degree:
            return self.replace(active_sh_degree=self.active_sh_degree + 1)
        return self


def _pad_rows(cap: int):
    """Inert row template per leaf.

    Host (numpy) inputs are padded in numpy and transferred once — a chain of
    eager jnp ops pays per-op dispatch (and per-shape remote compiles) on a
    tunneled TPU. Device inputs (capacity growth) stay on device — reading them
    back would be far worse."""
    def pad(name: str, arr) -> jnp.ndarray:
        n = arr.shape[0]
        if n == cap:
            return jnp.asarray(arr)
        shape = (cap - n,) + tuple(arr.shape[1:])
        on_host = isinstance(arr, np.ndarray)
        xp = np if on_host else jnp
        if name == "opacity":
            fill = xp.full(shape, PAD_OPACITY_LOGIT, np.float32)
        elif name == "scaling":
            fill = xp.full(shape, PAD_LOG_SCALE, np.float32)
        elif name == "rotation":
            if on_host:
                fill = np.zeros(shape, np.float32)
                fill[:, 0] = 1.0
            else:
                fill = jnp.zeros(shape, jnp.float32).at[:, 0].set(1.0)
        else:
            fill = xp.zeros(shape, np.float32)
        if on_host:
            return jnp.asarray(
                np.concatenate([np.asarray(arr, np.float32), fill], axis=0)
            )
        return jnp.concatenate([arr, fill], axis=0)

    return pad


def create_from_pcd(
    points: np.ndarray,
    colors: np.ndarray,
    capacity: int,
    max_sh_degree: int = 3,
    spatial_lr_scale: float = 1.0,
) -> Gaussians:
    """Point-cloud initialization (upstream create_from_pcd; absent in the reference,
    SURVEY.md §2 GaussianModel row): SH dc from RGB, isotropic log-scale from mean
    3-NN distance, identity rotations, opacity = logit(0.1)."""
    n = len(points)
    if n > capacity:
        raise ValueError(f"{n} init points exceed capacity {capacity}")
    # all-numpy construction (see _pad_rows note)
    pts = np.asarray(points, np.float32)
    f_dc = np.asarray(rgb2sh(np.asarray(colors, np.float64)), np.float32)
    m = num_sh_coeffs(max_sh_degree) - 1
    f_rest = np.zeros((n, m, 3), np.float32)

    dist2 = np.maximum(np.asarray(_mean_knn_dist2(np.asarray(points, np.float64))), 1e-7)
    scaling = np.repeat(
        np.log(np.sqrt(dist2))[:, None], 3, axis=1
    ).astype(np.float32)
    rotation = np.zeros((n, 4), np.float32)
    rotation[:, 0] = 1.0
    opacity = np.full((n, 1), np.log(0.1 / 0.9), np.float32)  # logit(0.1)

    pad = _pad_rows(capacity)
    return Gaussians(
        xyz=pad("xyz", pts),
        f_dc=pad("f_dc", f_dc),
        f_rest=pad("f_rest", f_rest),
        opacity=pad("opacity", opacity),
        scaling=pad("scaling", scaling),
        rotation=pad("rotation", rotation),
        max_radii2D=jnp.zeros(capacity, jnp.float32),
        xyz_gradient_accum=jnp.zeros(capacity, jnp.float32),
        denom=jnp.zeros(capacity, jnp.float32),
        n_live=jnp.asarray(n, jnp.int32),
        active_sh_degree=0,
        max_sh_degree=max_sh_degree,
        spatial_lr_scale=float(spatial_lr_scale),
    )


def _mean_knn_dist2(points: np.ndarray) -> jnp.ndarray:
    """Mean squared distance to the 3 nearest neighbors (upstream simple-knn
    `distCUDA2` semantics), via scipy cKDTree on host."""
    if len(points) <= 3:
        return np.full(len(points), 1e-4, np.float32)
    from scipy.spatial import cKDTree

    tree = cKDTree(points)
    dists, _ = tree.query(points, k=4)  # first col is self (0)
    return ((dists[:, 1:] ** 2).mean(axis=1)).astype(np.float32)


def grow_capacity(g: Gaussians, new_capacity: int) -> Gaussians:
    """Re-pad all arrays to a larger static capacity (host-side; triggers recompile)."""
    assert new_capacity >= g.capacity
    pad = _pad_rows(new_capacity)
    zpad = lambda a: jnp.concatenate(
        [a, jnp.zeros((new_capacity - a.shape[0],) + a.shape[1:], a.dtype)], axis=0
    )
    return g.replace(
        xyz=pad("xyz", g.xyz),
        f_dc=pad("f_dc", g.f_dc),
        f_rest=pad("f_rest", g.f_rest),
        opacity=pad("opacity", g.opacity),
        scaling=pad("scaling", g.scaling),
        rotation=pad("rotation", g.rotation),
        max_radii2D=zpad(g.max_radii2D),
        xyz_gradient_accum=zpad(g.xyz_gradient_accum),
        denom=zpad(g.denom),
    )
