"""Multi-device SPMD tests on the 8-virtual-CPU-device mesh (SURVEY.md §4 lesson 3).

Validates that the shard_map training step (camera-batch DP x tile-band
parallelism) produces the same loss/params as the single-device step math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu.config import MeshParams, OptimizationParams
from gsplat_tpu.core.camera import make_camera
from gsplat_tpu.core.gaussians import create_from_pcd
from gsplat_tpu.dist.mesh import make_mesh
from gsplat_tpu.dist.spmd import make_spmd_eval_step, make_spmd_train_step, stack_cameras
from gsplat_tpu.render.render import render
from gsplat_tpu.train.loss import photometric_loss
from gsplat_tpu.train.optim import adam_update, current_lrs, init_adam_state, make_lr_fns
from tests.fixtures import look_at_rig

W, H = 64, 32
MP = MeshParams(tile_size=16, chunk_size=32, pair_budget=1 << 12)


def scene(n_cams, seed=0):
    rng = np.random.default_rng(seed)
    n = 30
    g = create_from_pcd(rng.normal(size=(n, 3)) * 0.5, rng.random((n, 3)), capacity=64)
    cams = []
    for R, T in look_at_rig(n_cams):
        img = rng.random((H, W, 3)).astype(np.float32)
        cams.append(make_camera(R, T, fovx=0.9, fovy=0.6, width=W, height=H, image=img))
    return g, cams


def reference_batch_step(g, opt_state, cams, bg, step, opt):
    """Single-device math: mean loss over the camera batch, one Adam step, and
    upstream per-view densification stats (each view's UN-averaged screen grad)."""
    from gsplat_tpu.train.densify import add_densification_stats

    lr_fns = make_lr_fns(opt, 1.0)

    def loss_fn(params):
        g2 = g.with_params(params)
        losses = [
            photometric_loss(
                render(c, g2, bg, tile_size=MP.tile_size, chunk=MP.chunk_size,
                       pair_budget=MP.pair_budget).image,
                c.image, opt.lambda_dssim,
            )
            for c in cams
        ]
        return jnp.mean(jnp.stack(losses))

    loss, grads = jax.value_and_grad(loss_fn)(g.params())
    lrs = current_lrs(lr_fns, step)
    new_params, new_state = adam_update(g.params(), grads, opt_state, lrs)
    g_new = g.with_params(new_params)

    # upstream semantics: stats accumulate each view's own (not batch-averaged)
    # viewspace gradient — one render+grad per camera
    def view_off_grad(cam):
        off0 = jnp.zeros((g.capacity, 2), jnp.float32)

        def f(off):
            out = render(cam, g, bg, tile_size=MP.tile_size, chunk=MP.chunk_size,
                         pair_budget=MP.pair_budget, mean2d_offset=off)
            return photometric_loss(out.image, cam.image, opt.lambda_dssim), out.radii

        grad, radii = jax.grad(f, has_aux=True)(off0)
        return grad, radii

    for cam in cams:
        og, radii = view_off_grad(cam)
        g_new = add_densification_stats(g_new, og, radii, cam.width, cam.height)
    return g_new, new_state, loss


@pytest.mark.parametrize("mesh_shape", [(4, 2), (8, 1), (2, 2)])
def test_spmd_step_matches_single_device(mesh_shape):
    data, tile = mesh_shape
    ndev = data * tile
    if ndev > len(jax.devices()):
        pytest.skip("not enough devices")
    mesh = make_mesh(data=data, tile=tile, devices=jax.devices()[:ndev])
    g, cams = scene(n_cams=data)
    bg = jnp.zeros(3)
    opt = OptimizationParams()
    opt_state = init_adam_state(g.params())

    step_fn = make_spmd_train_step(mesh, opt, MP, 1.0, W, H, interpret=True)
    cam_batch = stack_cameras(cams)
    g_s, st_s, loss_s, ema_s, n_pairs_s, nd, _, _, _ = step_fn(
        g, opt_state, cam_batch, bg, jnp.asarray(1, jnp.int32),
        jnp.zeros((), jnp.float32),
    )
    assert int(n_pairs_s) > 0 and int(nd) == 0
    np.testing.assert_allclose(float(ema_s), float(loss_s), rtol=1e-6)

    g_r, st_r, loss_r = reference_batch_step(
        g, opt_state, cams, bg, jnp.asarray(1, jnp.int32), opt
    )
    np.testing.assert_allclose(float(loss_s), float(loss_r), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g_s.xyz), np.asarray(g_r.xyz), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(st_s.mu["opacity"]), np.asarray(st_r.mu["opacity"]), atol=1e-6
    )
    # densification stats must match upstream single-camera magnitudes
    # regardless of mesh shape (ADVICE r1: off_grads arrive pmean-scaled)
    np.testing.assert_allclose(
        np.asarray(g_s.xyz_gradient_accum), np.asarray(g_r.xyz_gradient_accum),
        atol=1e-6,
    )
    np.testing.assert_allclose(np.asarray(g_s.denom), np.asarray(g_r.denom))
    np.testing.assert_allclose(
        np.asarray(g_s.max_radii2D), np.asarray(g_r.max_radii2D), atol=1e-5
    )


def test_spmd_eval_matches_render():
    mesh = make_mesh(data=4, tile=2, devices=jax.devices()[:8])
    g, cams = scene(n_cams=1, seed=3)
    cam = cams[0]
    bg = jnp.zeros(3)
    eval_fn = make_spmd_eval_step(mesh, MP, 0.2, W, H, interpret=True)
    loss, p, img, nd = eval_fn(g, cam, bg)
    assert int(nd) == 0
    ref_img = render(cam, g, bg, tile_size=MP.tile_size, chunk=MP.chunk_size,
                     pair_budget=MP.pair_budget).image
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref_img), atol=2e-5)
    ref_loss = photometric_loss(ref_img, cam.image, 0.2)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)


def test_dryrun_entrypoints():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[2] == 3
    ge.dryrun_multichip(8)


def test_full_train_driver_spmd(tmp_path):
    """train() end-to-end over the 4x2 CPU mesh (SPMD path wired via MeshParams)."""
    from gsplat_tpu.config import (
        MeshParams, ModelParams, OptimizationParams, OtherParams, PipelineParams,
    )
    from gsplat_tpu.train.loop import train
    from tests.fixtures import make_colmap_scene

    scene_root = tmp_path / "scene"
    make_colmap_scene(scene_root, n_cams=9, width=48, height=32, n_points=40)
    model = ModelParams(
        source_path=str(scene_root), model_path=str(tmp_path / "out"), eval=True
    )
    opt = OptimizationParams(iterations=4, densify_from_iter=100)
    other = OtherParams(test_iterations=[], save_iterations=[], quiet=True)
    mesh = MeshParams(
        data_axis=4, tile_axis=2, tile_size=16, chunk_size=32,
        pair_budget=1 << 12, capacity=64,
    )
    g, scene = train(model, opt, PipelineParams(), other, mesh)
    assert int(g.n_live) > 0


def test_global_camera_batch_feeds_spmd_step():
    """dist.data: globally-sharded camera batch (make_array_from_process_local_data)
    drives the SPMD step to the same result as host-stacked cameras."""
    from gsplat_tpu.dist.data import global_camera_batch, replicate_gaussians

    mesh = make_mesh(data=4, tile=2, devices=jax.devices()[:8])
    g, cams = scene(n_cams=4, seed=5)
    bg = jnp.zeros(3)
    opt = OptimizationParams()
    opt_state = init_adam_state(g.params())
    step_fn = make_spmd_train_step(mesh, opt, MP, 1.0, W, H, interpret=True)

    g_rep = replicate_gaussians(mesh, g)
    batch = global_camera_batch(mesh, cams)
    zema = jnp.zeros((), jnp.float32)
    g1, _, loss1, _, _, _, _, _, _ = step_fn(
        g_rep, opt_state, batch, bg, jnp.asarray(1, jnp.int32), zema)

    stacked = stack_cameras(cams)
    g2, _, loss2, _, _, _, _, _, _ = step_fn(
        g, opt_state, stacked, bg, jnp.asarray(1, jnp.int32), zema)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1.xyz), np.asarray(g2.xyz), atol=1e-7)


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 2)])
def test_sharded_gaussian_step_matches_replicated(mesh_shape):
    """ZeRO-style sharded-Gaussian step (params+Adam sharded over `data`,
    projected-attr all_to_all) computes the same update as the replicated
    step (VERDICT r1 item 9)."""
    from gsplat_tpu.dist.data import shard_gaussians
    from gsplat_tpu.dist.spmd import make_sharded_spmd_train_step

    data, tile = mesh_shape
    ndev = data * tile
    if ndev > len(jax.devices()):
        pytest.skip("not enough devices")
    mesh = make_mesh(data=data, tile=tile, devices=jax.devices()[:ndev])
    g, cams = scene(n_cams=data, seed=7)
    bg = jnp.zeros(3)
    opt = OptimizationParams()
    opt_state = init_adam_state(g.params())
    batch = stack_cameras(cams)
    zema = jnp.zeros((), jnp.float32)
    step = jnp.asarray(1, jnp.int32)

    rep_fn = make_spmd_train_step(mesh, opt, MP, 1.0, W, H, interpret=True)
    g_r, st_r, loss_r, _, _, nd_r, _, _, _ = rep_fn(g, opt_state, batch, bg, step, zema)

    g_sh, st_sh = shard_gaussians(mesh, g, opt_state)
    sh_fn = make_sharded_spmd_train_step(mesh, opt, MP, 1.0, W, H, interpret=True)
    g_s, st_s, loss_s, _, n_pairs, nd_s, _, _, _ = sh_fn(g_sh, st_sh, batch, bg, step, zema)

    np.testing.assert_allclose(float(loss_s), float(loss_r), rtol=1e-5)
    assert int(nd_s) == int(nd_r) == 0
    np.testing.assert_allclose(np.asarray(g_s.xyz), np.asarray(g_r.xyz), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(st_s.mu["opacity"]), np.asarray(st_r.mu["opacity"]), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(g_s.xyz_gradient_accum), np.asarray(g_r.xyz_gradient_accum),
        atol=1e-6,
    )
    # the win: parameters and moments live sharded over `data`
    from jax.sharding import PartitionSpec
    assert g_s.xyz.sharding.spec == PartitionSpec("data")
    assert st_s.mu["xyz"].sharding.spec == PartitionSpec("data")


def test_spmd_kept_frac_matches_full():
    """MeshParams.kept_frac < 1 (cull + kept split) leaves the SPMD step's
    loss/params unchanged when the kept budget covers the survivors."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    mesh = make_mesh(data=2, tile=2, devices=jax.devices()[:4])
    g, cams = scene(n_cams=2)
    bg = jnp.zeros(3)
    opt = OptimizationParams()
    opt_state = init_adam_state(g.params())
    batch = stack_cameras(cams)
    args = (g, opt_state, batch, bg, jnp.asarray(1, jnp.int32),
            jnp.zeros((), jnp.float32))

    full_fn = make_spmd_train_step(mesh, opt, MP, 1.0, W, H, interpret=True)
    g_f, _, loss_f, _, _, nd_f, _, _, _ = full_fn(*args)

    mp_kept = MP.__class__(**{**MP.__dict__, "kept_frac": 0.9})
    kept_fn = make_spmd_train_step(mesh, opt, mp_kept, 1.0, W, H, interpret=True)
    g_k, _, loss_k, _, _, nd_k, n_culled, _, _ = kept_fn(*args)

    assert int(nd_f) == int(nd_k) == 0
    np.testing.assert_allclose(float(loss_k), float(loss_f), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_k.xyz), np.asarray(g_f.xyz),
                               atol=1e-5)


def test_sharded_trainer_end_to_end(tmp_path):
    """--shard_gaussians through the REAL train() driver (VERDICT r2 item 5):
    a multi-iteration run with a densify event and an opacity reset, ZeRO-
    sharded over `data`, matches the replicated-trainer run to ulp-level
    tolerance (the sharded step accumulates parameter gradients through the
    all_to_all transpose instead of a psum — same values, different reduction
    order) and produces identical densify decisions (n_live, capacity)."""
    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    import random

    from gsplat_tpu.config import ModelParams, OtherParams, PipelineParams
    from gsplat_tpu.train.loop import train
    from tests.fixtures import make_colmap_scene

    scene_root = tmp_path / "scene"
    make_colmap_scene(scene_root, n_cams=8, width=48, height=32, n_points=30)

    def run(sub, shard):
        random.seed(0)
        model = ModelParams(source_path=str(scene_root),
                            model_path=str(tmp_path / sub))
        opt = OptimizationParams(
            iterations=8, densify_from_iter=2, densification_interval=5,
            densify_until_iter=8, opacity_reset_interval=6,
        )
        other = OtherParams(test_iterations=[], save_iterations=[],
                            checkpoint_iterations=[8], quiet=True)
        mesh = MeshParams(
            tile_size=16, chunk_size=32, pair_budget=1 << 12, capacity=64,
            data_axis=4, tile_axis=2, shard_gaussians=shard,
        )
        g, _ = train(model, opt, PipelineParams(), other, mesh)
        return g

    g_rep = run("rep", False)
    g_sha = run("sha", True)
    assert int(g_rep.n_live) == int(g_sha.n_live)
    assert g_rep.capacity == g_sha.capacity
    np.testing.assert_allclose(
        np.asarray(g_rep.xyz), np.asarray(g_sha.xyz), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(g_rep.opacity), np.asarray(g_sha.opacity), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(g_rep.scaling), np.asarray(g_sha.scaling), atol=1e-5
    )
    # the sharded run's checkpoint is written from the gathered (host-view)
    # state and loads back into the replicated layout
    from gsplat_tpu.ckpt import load_checkpoint

    g_ck, _, it = load_checkpoint(str(tmp_path / "sha" / "chkpnt8.npz"), 64)
    assert it == 8
    np.testing.assert_allclose(
        np.asarray(g_ck.xyz)[: int(g_sha.n_live)],
        np.asarray(g_sha.xyz)[: int(g_sha.n_live)], atol=1e-6,
    )
