"""Training-stack integration tests: loss decreases on a tiny self-consistent scene,
checkpoint round-trips, the CLI flag surface parses (SURVEY.md §4 lesson (1))."""

import math
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu.ckpt import load_checkpoint, save_checkpoint, save_ply
from gsplat_tpu.config import MeshParams, OptimizationParams
from gsplat_tpu.core.camera import make_camera
from gsplat_tpu.core.gaussians import create_from_pcd
from gsplat_tpu.io.ply import load_gaussian_ply
from gsplat_tpu.render.render import render
from gsplat_tpu.train.loop import make_train_step
from gsplat_tpu.train.optim import init_adam_state
from tests.fixtures import look_at_rig

W, H = 64, 48


def make_cams(n, images=None):
    cams = []
    for i, (R, T) in enumerate(look_at_rig(n)):
        img = None if images is None else images[i]
        cams.append(
            make_camera(R, T, fovx=0.9, fovy=0.7, width=W, height=H, image=img)
        )
    return cams


def test_training_reduces_loss():
    rng = np.random.default_rng(0)
    n = 40
    pts = rng.normal(size=(n, 3)) * 0.5
    cols = rng.random((n, 3))
    g_true = create_from_pcd(pts, cols, capacity=64)
    bg = jnp.zeros(3)
    cams0 = make_cams(3)
    targets = [
        np.asarray(render(c, g_true, bg, tile_size=16, chunk=32, pair_budget=1 << 12).image)
        for c in cams0
    ]
    cams = make_cams(3, targets)

    # init from perturbed points/colors
    g = create_from_pcd(
        pts + rng.normal(size=pts.shape) * 0.1,
        rng.random((n, 3)),
        capacity=64,
    )
    opt = OptimizationParams(position_lr_delay_mult=1.0)
    mesh = MeshParams(tile_size=16, chunk_size=32, pair_budget=1 << 12)
    step = make_train_step(opt, mesh, spatial_lr_scale=1.0, width=W, height=H)
    opt_state = init_adam_state(g.params())

    losses = []
    ema = jnp.zeros((), jnp.float32)
    for it in range(1, 61):
        cam = cams[it % len(cams)]
        g, opt_state, loss, ema, _, _, _, _, _ = step(
            g, opt_state, cam, bg, jnp.asarray(it, jnp.int32), ema
        )
        losses.append(float(loss))
    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert last < 0.6 * first, (first, last)
    # densification stats accumulated during training
    assert float(jnp.sum(g.denom)) > 0


def test_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    g = create_from_pcd(rng.normal(size=(10, 3)), rng.random((10, 3)), capacity=16)
    opt_state = init_adam_state(g.params())
    mu = {k: v + 1.5 for k, v in opt_state.mu.items()}
    opt_state = opt_state.replace(mu=mu, count=jnp.asarray(42, jnp.int32))

    p = tmp_path / "chk.npz"
    save_checkpoint(p, g, opt_state, step=123)
    g2, opt2, step = load_checkpoint(p, capacity=16)
    assert step == 123
    assert int(opt2.count) == 42
    np.testing.assert_allclose(np.asarray(g2.xyz[:10]), np.asarray(g.xyz[:10]))
    np.testing.assert_allclose(np.asarray(opt2.mu["xyz"][:10]), 1.5)
    # re-padding to larger capacity
    g3, _, _ = load_checkpoint(p, capacity=64)
    assert g3.capacity == 64 and int(g3.n_live) == 10


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    g = create_from_pcd(rng.normal(size=(10, 3)), rng.random((10, 3)), capacity=16)
    p = tmp_path / "pc.ply"
    save_ply(p, g)
    raw = load_gaussian_ply(p)
    np.testing.assert_allclose(raw["xyz"], np.asarray(g.xyz[:10]), rtol=1e-6)
    np.testing.assert_allclose(raw["scaling"], np.asarray(g.scaling[:10]), rtol=1e-6)
    assert raw["features_rest"].shape == (10, 15, 3)


def test_exact_resume(tmp_path):
    """Interrupt->resume reproduces the uninterrupted run bit-for-bit: the
    checkpoint persists RNG key, python-random state, camera-order cursor, EMA
    and pair budget (VERDICT r1 item 7)."""
    from gsplat_tpu.config import ModelParams, OtherParams, PipelineParams
    from gsplat_tpu.train.loop import train
    from tests.fixtures import make_colmap_scene

    scene_root = tmp_path / "scene"
    make_colmap_scene(scene_root, n_cams=5, width=48, height=32, n_points=30)
    mesh = MeshParams(tile_size=16, chunk_size=32, pair_budget=1 << 12, capacity=64)

    def run(out, iters, ckpt_at=None, start_ckpt=None):
        model = ModelParams(source_path=str(scene_root), model_path=str(out))
        opt = OptimizationParams(
            iterations=iters, random_background=True,
            densify_from_iter=2, densification_interval=5, densify_until_iter=iters,
            opacity_reset_interval=10**9,
        )
        other = OtherParams(
            test_iterations=[], save_iterations=[], quiet=True,
            checkpoint_iterations=[ckpt_at] if ckpt_at else [],
            start_checkpoint=start_ckpt,
        )
        g, _ = train(model, opt, PipelineParams(), other, mesh)
        return g

    g_full = run(tmp_path / "full", 14, ckpt_at=7)
    g_resumed = run(
        tmp_path / "resumed", 14, start_ckpt=str(tmp_path / "full" / "chkpnt7.npz")
    )
    np.testing.assert_array_equal(np.asarray(g_full.xyz), np.asarray(g_resumed.xyz))
    np.testing.assert_array_equal(
        np.asarray(g_full.opacity), np.asarray(g_resumed.opacity)
    )
    assert int(g_full.n_live) == int(g_resumed.n_live)


def test_cli_parses_reference_flags():
    """The reference's full flag surface (src/arguments/params.cpp:9-66)."""
    from gsplat_tpu.config import parse_parameters

    model, opt, pipe, other, mesh = parse_parameters(
        [
            "--source_path", "/x", "--model_path", "/y", "--white_background",
            "--eval", "--sh_degree", "2", "--iterations", "7000",
            "--position_lr_init", "0.0002", "--lambda_dssim", "0.3",
            "--densify_grad_threshold", "0.0005",
            "--test_iterations", "100", "200",
            "--save_iterations", "100",
            "--ip", "0.0.0.0", "--port", "6010", "--quiet",
        ]
    )
    assert model.white_background and model.eval and model.sh_degree == 2
    assert opt.iterations == 7000 and opt.lambda_dssim == 0.3
    assert other.test_iterations == [100, 200]
    assert other.ip == "0.0.0.0" and other.port == 6010 and other.quiet
    # defaults preserved (reference params.h:50-91)
    assert opt.opacity_reset_interval == 3000
    assert opt.densify_until_iter == 15000


def test_sat_auto_probe_and_enable(tmp_path, monkeypatch):
    """AUTO saturation cull (sat_frac=-1, the default): the driver probes
    n_sat telemetry at sat_probe_interval and enables the cull when it would
    cut >= 2x. Probe path (real telemetry) must not disturb training; the
    enable path is exercised by faking a saturating probe and checking the
    full machinery downstream: enable -> real render overflows the fitted
    budget -> adaptive regrow -> telemetry reports n_sat."""
    import json

    import gsplat_tpu.train.loop as loop_mod
    from gsplat_tpu.config import ModelParams, OtherParams, PipelineParams
    from gsplat_tpu.io.synthetic import make_colmap_scene
    from gsplat_tpu.train.loop import train

    scene_root = tmp_path / "scene"
    make_colmap_scene(scene_root, n_cams=4, width=48, height=32, n_points=30)

    def run(out, iters):
        model = ModelParams(source_path=str(scene_root), model_path=str(out))
        opt = OptimizationParams(
            iterations=iters, densify_from_iter=10**9,
            densify_until_iter=0, opacity_reset_interval=10**9,
        )
        other = OtherParams(test_iterations=[], save_iterations=[], quiet=True)
        mesh = MeshParams(tile_size=16, chunk_size=32, pair_budget=1 << 12,
                          capacity=64, sat_probe_interval=4)
        g, _ = train(model, opt, PipelineParams(), other, mesh,
                     progress_every=2)
        return out

    # 1) real probe on the sparse random scene: init opacity 0.1 quantizes to
    # q=0 (no provable saturation), so the cull must stay OFF and training
    # must be undisturbed
    out1 = run(tmp_path / "auto_off", 12)
    steps = [json.loads(l) for l in open(out1 / "metrics.jsonl")
             if "n_sat_pairs" in json.loads(l or "{}")]
    assert steps and all(s["n_sat_pairs"] == 0 for s in steps)

    # 2) fake a strongly-saturating probe: the driver must enable the cull,
    # then the REAL n_sat (whole kept set, scene has no saturation) overflows
    # the fitted budget and the adaptive regrow recovers
    real_probe = loop_mod._sat_probe

    def fake_probe(g, cam, bg, **kw):
        import jax.numpy as jnp
        ns, npair, ncull, ndrop = real_probe(g, cam, bg, **kw)
        return jnp.asarray(32, jnp.int32), npair, ncull, ndrop

    monkeypatch.setattr(loop_mod, "_sat_probe", fake_probe)
    out2 = run(tmp_path / "auto_on", 30)
    steps = [json.loads(l) for l in open(out2 / "metrics.jsonl")
             if "n_sat_pairs" in json.loads(l or "{}")]
    assert steps and steps[-1]["n_sat_pairs"] > 0, steps


def test_auto_kept_contrib_budget_fit(tmp_path):
    """AUTO kept/contrib budgets (kept_frac/contrib_frac = -1, the defaults):
    after 20 low-usage checks (200 iterations) the driver fits the post-sort
    kept split and the backward-compaction budget from telemetry; the fitted
    values persist into checkpoints (and training is undisturbed)."""
    from gsplat_tpu.ckpt import load_checkpoint_extras
    from gsplat_tpu.config import ModelParams, OtherParams, PipelineParams
    from gsplat_tpu.io.synthetic import make_colmap_scene
    from gsplat_tpu.train.loop import train

    scene_root = tmp_path / "scene"
    make_colmap_scene(scene_root, n_cams=4, width=48, height=32, n_points=30)
    out = tmp_path / "model"
    model = ModelParams(source_path=str(scene_root), model_path=str(out))
    opt = OptimizationParams(
        iterations=260, densify_from_iter=10**9, densify_until_iter=0,
        opacity_reset_interval=10**9,
    )
    other = OtherParams(test_iterations=[], save_iterations=[],
                        checkpoint_iterations=[260], quiet=True)
    mesh = MeshParams(tile_size=16, chunk_size=32, pair_budget=1 << 12,
                      capacity=64, sat_probe_interval=10**9)
    train(model, opt, PipelineParams(), other, mesh)

    extras = load_checkpoint_extras(out / "chkpnt260.npz")
    assert "kept_budget" in extras and "contrib_budget" in extras, extras.keys()
    kept = int(extras["kept_budget"])
    contrib = int(extras["contrib_budget"])
    assert 32 <= kept < (1 << 12), kept
    assert 512 <= contrib, contrib
    # and the resumed run accepts the fitted budgets (auto restore path)
    other2 = OtherParams(test_iterations=[], save_iterations=[],
                         checkpoint_iterations=[],
                         start_checkpoint=str(out / "chkpnt260.npz"),
                         quiet=True)
    opt2 = OptimizationParams(
        iterations=270, densify_from_iter=10**9, densify_until_iter=0,
        opacity_reset_interval=10**9,
    )
    g2, _ = train(model, opt2, PipelineParams(), other2, mesh)
    assert int(g2.n_live) > 0
