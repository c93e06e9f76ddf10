"""Per-group Adam optimizer with the upstream 3DGS learning-rate surface.

Reference: `GaussianModel::setup` builds six named `torch::optim::Adam` instances
(one per parameter group) with eps=1e-15 and the upstream LRs — xyz scaled by
spatial_lr_scale on an exponential log-lerp schedule, f_rest = feature_lr / 20
(src/scene/gaussian_model.cpp:316-352); `update_learning_rate` mutates the xyz LR
per step (src/scene/gaussian_model.cpp:355-361).

TPU-first design: Adam is implemented as a pure function over a pytree state
{mu, nu, count} keyed like the parameter dict. This (rather than a packaged
optimizer object) is deliberate: densification must clone/split/prune optimizer
moments row-wise alongside parameters (upstream's cat_tensors_to_optimizer /
_prune_optimizer), which is a first-class pytree transformation here — no
optimizer-internals surgery needed. Everything jits and shards; the per-step xyz
LR is computed inside the jitted step from the traced step counter (no host
callback per iteration, unlike the reference's host-side mutation).
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
from flax import struct

from gsplat_tpu.config import OptimizationParams
from gsplat_tpu.core.transforms import get_expon_lr_func

ADAM_B1 = 0.9
ADAM_B2 = 0.999
ADAM_EPS = 1e-15  # upstream 3DGS value (reference gaussian_model.cpp:323-351)


@struct.dataclass
class AdamState:
    mu: Dict[str, jnp.ndarray]
    nu: Dict[str, jnp.ndarray]
    count: jnp.ndarray  # () int32, shared across groups (stepped together)


def init_adam_state(params: Dict[str, jnp.ndarray]) -> AdamState:
    zeros = lambda t: jax.tree.map(jnp.zeros_like, t)
    return AdamState(mu=zeros(params), nu=zeros(params), count=jnp.zeros((), jnp.int32))


def make_lr_fns(
    opt: OptimizationParams, spatial_lr_scale: float
) -> Dict[str, Callable]:
    """Per-group LR callables of the (traced) step. Groups and values follow the
    reference's setup (gaussian_model.cpp:323-351)."""
    xyz_schedule = get_expon_lr_func(
        lr_init=opt.position_lr_init * spatial_lr_scale,
        lr_final=opt.position_lr_final * spatial_lr_scale,
        lr_delay_mult=opt.position_lr_delay_mult,
        max_steps=opt.position_lr_max_steps,
    )
    const = lambda v: (lambda step: jnp.asarray(v, jnp.float32))
    return {
        "xyz": xyz_schedule,
        "f_dc": const(opt.feature_lr),
        "f_rest": const(opt.feature_lr / 20.0),
        "opacity": const(opt.opacity_lr),
        "scaling": const(opt.scaling_lr),
        "rotation": const(opt.rotation_lr),
    }


def adam_update(
    params: Dict[str, jnp.ndarray],
    grads: Dict[str, jnp.ndarray],
    state: AdamState,
    lrs: Dict[str, jnp.ndarray],
) -> tuple[Dict[str, jnp.ndarray], AdamState]:
    """One Adam step over the parameter dict; `lrs` maps group -> scalar LR.

    Bias correction follows torch::optim::Adam (reference's optimizer), i.e.
    step_size = lr * sqrt(1-b2^t) / (1-b1^t).
    """
    count = state.count + 1
    t = count.astype(jnp.float32)
    bc1 = 1.0 - ADAM_B1 ** t
    bc2 = 1.0 - ADAM_B2 ** t

    new_params, new_mu, new_nu = {}, {}, {}
    for k in params:
        g = grads[k]
        mu = ADAM_B1 * state.mu[k] + (1.0 - ADAM_B1) * g
        nu = ADAM_B2 * state.nu[k] + (1.0 - ADAM_B2) * (g * g)
        step = lrs[k] * (mu / bc1) / (jnp.sqrt(nu / bc2) + ADAM_EPS)
        new_params[k] = params[k] - step
        new_mu[k] = mu
        new_nu[k] = nu
    return new_params, AdamState(mu=new_mu, nu=new_nu, count=count)


def current_lrs(
    lr_fns: Dict[str, Callable], step: jnp.ndarray
) -> Dict[str, jnp.ndarray]:
    return {k: fn(step) for k, fn in lr_fns.items()}
