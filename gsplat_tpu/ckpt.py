"""Checkpoint / resume and PLY export.

Reference: GaussianModel::capture/restore persist the tensor list {sh_degree, xyz,
f_dc, f_rest, scaling, rotation, opacity, max_radii2D, grad_accum, denom,
spatial_lr_scale} plus six per-group optimizer states via torch::save
(src/scene/gaussian_model.cpp:76-202); iteration discovery scans the point_cloud dir
(src/utils/system_utils.cpp:7-31); `--checkpoint_iterations`/`--start_checkpoint`
flags exist but the load call is stubbed (src/utils/train_utils.cpp:110-113).

Here: one .npz per checkpoint holding the full Gaussian pytree + Adam moments +
step (host numpy arrays; capacity-padded arrays are cropped to live rows so
checkpoints are capacity-independent), and the standard 3DGS `point_cloud.ply`
layout for viewer interop (absent upstream save_ply in the reference).
"""

from __future__ import annotations

from pathlib import Path
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from gsplat_tpu.core.gaussians import Gaussians
from gsplat_tpu.io.ply import save_gaussian_ply
from gsplat_tpu.train.optim import AdamState


def save_checkpoint(
    path: str | Path, g: Gaussians, opt_state: AdamState, step: int,
    extra: dict | None = None,
) -> None:
    """`extra`: driver-loop state for bit-exact resume (RNG key, camera-order
    cursor, EMA loss, pair budget, ...) stored under `extra_*` keys; read back
    with load_checkpoint_extras."""
    n = int(g.n_live)
    crop = lambda a: np.asarray(a)[:n]
    arrays = {
        "step": np.asarray(step, np.int64),
        "active_sh_degree": np.asarray(g.active_sh_degree, np.int64),
        "max_sh_degree": np.asarray(g.max_sh_degree, np.int64),
        "spatial_lr_scale": np.asarray(g.spatial_lr_scale, np.float64),
        "capacity": np.asarray(g.capacity, np.int64),
        "xyz": crop(g.xyz),
        "f_dc": crop(g.f_dc),
        "f_rest": crop(g.f_rest),
        "opacity": crop(g.opacity),
        "scaling": crop(g.scaling),
        "rotation": crop(g.rotation),
        "max_radii2D": crop(g.max_radii2D),
        "xyz_gradient_accum": crop(g.xyz_gradient_accum),
        "denom": crop(g.denom),
        "adam_count": np.asarray(opt_state.count),
    }
    for k, v in opt_state.mu.items():
        arrays[f"mu_{k}"] = crop(v)
    for k, v in opt_state.nu.items():
        arrays[f"nu_{k}"] = crop(v)
    for k, v in (extra or {}).items():
        arrays[f"extra_{k}"] = np.asarray(v)
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    np.savez(p, **arrays)


def load_checkpoint_extras(path: str | Path) -> dict:
    """Driver-loop resume state saved via save_checkpoint(extra=...); {} for
    checkpoints written without it (backward compatible)."""
    z = np.load(path)
    return {k[len("extra_"):]: z[k] for k in z.files if k.startswith("extra_")}


def load_checkpoint(
    path: str | Path, capacity: int
) -> Tuple[Gaussians, AdamState, int]:
    """Restore (gaussians, opt_state, step); re-pads to `capacity` (grown if the
    checkpoint holds more live rows)."""
    from gsplat_tpu.core.gaussians import PARAM_KEYS, _pad_rows
    from gsplat_tpu.scene import _next_pow2

    z = np.load(path)
    n = len(z["xyz"])
    saved_cap = int(z["capacity"]) if "capacity" in z.files else 0
    # restore the exact capacity the run had grown to (bit-exact resume: densify
    # overflow/drop behavior depends on it), never below the requested floor
    cap = max(capacity, saved_cap, _next_pow2(n))
    pad = _pad_rows(cap)
    zpad = lambda a: jnp.concatenate(
        [jnp.asarray(a, jnp.float32),
         jnp.zeros((cap - len(a),) + a.shape[1:], jnp.float32)], axis=0
    )
    g = Gaussians(
        xyz=pad("xyz", jnp.asarray(z["xyz"], jnp.float32)),
        f_dc=pad("f_dc", jnp.asarray(z["f_dc"], jnp.float32)),
        f_rest=pad("f_rest", jnp.asarray(z["f_rest"], jnp.float32)),
        opacity=pad("opacity", jnp.asarray(z["opacity"], jnp.float32)),
        scaling=pad("scaling", jnp.asarray(z["scaling"], jnp.float32)),
        rotation=pad("rotation", jnp.asarray(z["rotation"], jnp.float32)),
        max_radii2D=zpad(z["max_radii2D"]),
        xyz_gradient_accum=zpad(z["xyz_gradient_accum"]),
        denom=zpad(z["denom"]),
        n_live=jnp.asarray(n, jnp.int32),
        active_sh_degree=int(z["active_sh_degree"]),
        max_sh_degree=int(z["max_sh_degree"]),
        spatial_lr_scale=float(z["spatial_lr_scale"]),
    )
    opt = AdamState(
        mu={k: zpad(z[f"mu_{k}"]) for k in PARAM_KEYS},
        nu={k: zpad(z[f"nu_{k}"]) for k in PARAM_KEYS},
        count=jnp.asarray(z["adam_count"], jnp.int32),
    )
    return g, opt, int(z["step"])


def save_ply(path: str | Path, g: Gaussians) -> None:
    """Standard 3DGS point_cloud.ply of the live rows (upstream save_ply; absent in
    the reference)."""
    n = int(g.n_live)
    crop = lambda a: np.asarray(a)[:n]
    save_gaussian_ply(
        path,
        xyz=crop(g.xyz),
        features_dc=crop(g.f_dc),
        features_rest=crop(g.f_rest),
        opacity=crop(g.opacity),
        scaling=crop(g.scaling),
        rotation=crop(g.rotation),
    )
