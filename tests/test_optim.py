"""Adam + LR-schedule tests (reference gaussian_model.cpp:316-361 semantics)."""

import jax.numpy as jnp
import numpy as np

from gsplat_tpu.config import OptimizationParams
from gsplat_tpu.train.optim import (
    ADAM_B1,
    ADAM_B2,
    ADAM_EPS,
    adam_update,
    current_lrs,
    init_adam_state,
    make_lr_fns,
)


def test_adam_first_step_matches_torch_semantics():
    """After one step with grad g, torch Adam moves by ~lr*sign(g) (bias-corrected)."""
    params = {"xyz": jnp.asarray([[1.0, 2.0, 3.0]])}
    grads = {"xyz": jnp.asarray([[0.5, -0.5, 2.0]])}
    state = init_adam_state(params)
    lrs = {"xyz": jnp.asarray(0.1, jnp.float32)}
    new_params, state = adam_update(params, grads, state, lrs)
    # closed form: mu=(1-b1)g, nu=(1-b2)g^2, step = lr*(mu/(1-b1))/(sqrt(nu/(1-b2))+eps)
    g = np.array([[0.5, -0.5, 2.0]])
    step = 0.1 * g / (np.abs(g) + ADAM_EPS)
    np.testing.assert_allclose(
        np.asarray(new_params["xyz"]), np.array([[1.0, 2.0, 3.0]]) - step, rtol=1e-6
    )
    assert int(state.count) == 1


def test_adam_converges_quadratic():
    params = {"x": jnp.asarray([5.0, -3.0])}
    state = init_adam_state(params)
    lrs = {"x": jnp.asarray(0.1, jnp.float32)}
    for _ in range(500):
        grads = {"x": 2.0 * params["x"]}
        params, state = adam_update(params, grads, state, lrs)
    assert float(jnp.abs(params["x"]).max()) < 1e-2


def test_lr_groups_match_reference():
    """Group LRs: xyz scheduled*scale, f_rest = feature/20, etc.
    (reference gaussian_model.cpp:323-351)."""
    opt = OptimizationParams()
    fns = make_lr_fns(opt, spatial_lr_scale=2.0)
    lrs0 = current_lrs(fns, jnp.asarray(0))
    # lr_delay_steps=0 upstream => no delay ramp at step 0
    assert np.isclose(float(lrs0["xyz"]), opt.position_lr_init * 2.0)
    assert np.isclose(float(lrs0["f_dc"]), opt.feature_lr)
    assert np.isclose(float(lrs0["f_rest"]), opt.feature_lr / 20.0)
    assert np.isclose(float(lrs0["opacity"]), opt.opacity_lr)
    assert np.isclose(float(lrs0["scaling"]), opt.scaling_lr)
    assert np.isclose(float(lrs0["rotation"]), opt.rotation_lr)
    # at max_steps the xyz lr hits final*scale
    lrs_end = current_lrs(fns, jnp.asarray(opt.position_lr_max_steps))
    assert np.isclose(
        float(lrs_end["xyz"]), opt.position_lr_final * 2.0, rtol=1e-5
    )
