"""End-to-end CLI tool tests on a synthetic COLMAP scene: train -> render sets ->
metrics (the upstream train.py/render.py/metrics.py workflow the reference never
implements; SURVEY.md §0)."""

import json
from pathlib import Path

import numpy as np
import pytest

from tests.fixtures import make_colmap_scene


@pytest.fixture(scope="module")
def trained_model(tmp_path_factory):
    scene_root = tmp_path_factory.mktemp("scene")
    make_colmap_scene(scene_root, n_cams=6, width=48, height=32, n_points=40)
    out = tmp_path_factory.mktemp("model")

    from gsplat_tpu.cli import main

    main([
        "--source_path", str(scene_root), "--model_path", str(out),
        "--eval", "--iterations", "8", "--capacity", "64",
        "--pair_budget", "4096", "--chunk_size", "32",
        "--save_iterations", "8", "--quiet",
    ])
    return scene_root, out


def test_train_artifacts(trained_model):
    scene_root, out = trained_model
    assert (out / "cfg_args").exists()
    assert (out / "cameras.json").exists()
    assert (out / "input.ply").exists()
    assert (out / "point_cloud" / "iteration_8" / "point_cloud.ply").exists()
    cams = json.loads((out / "cameras.json").read_text())
    assert len(cams) == 6
    assert {"id", "img_name", "position", "rotation", "fx", "fy"} <= set(cams[0])


def test_render_cli(trained_model):
    scene_root, out = trained_model
    from gsplat_tpu.render_cli import main

    main(["--model_path", str(out), "--iteration", "-1",
          "--pair_budget", "4096"])
    test_renders = out / "test" / "ours_8" / "renders"
    train_renders = out / "train" / "ours_8" / "renders"
    assert len(list(test_renders.iterdir())) == 1   # llffhold=8 -> 1 of 6 to test
    assert len(list(train_renders.iterdir())) == 5
    assert (out / "test" / "ours_8" / "gt" / "00000.png").exists()


def test_metrics_cli(trained_model):
    scene_root, out = trained_model
    from gsplat_tpu.metrics_cli import main

    main(["--model_paths", str(out)])
    results = json.loads((out / "results.json").read_text())
    key = "test/ours_8"
    assert key in results
    assert results[key]["n_images"] == 1
    assert results[key]["PSNR"] is not None and results[key]["PSNR"] > 0
    assert 0.0 <= results[key]["SSIM"] <= 1.0


def test_checkpoint_resume(trained_model, tmp_path):
    """--checkpoint_iterations + --start_checkpoint exact-resume (the reference
    stubs the load, train_utils.cpp:110-113)."""
    scene_root, out = trained_model
    from gsplat_tpu.cli import main

    out2 = tmp_path / "resume"
    main([
        "--source_path", str(scene_root), "--model_path", str(out2),
        "--eval", "--iterations", "4", "--capacity", "64",
        "--pair_budget", "4096", "--chunk_size", "32",
        "--checkpoint_iterations", "4", "--save_iterations", "99", "--quiet",
    ])
    ck = out2 / "chkpnt4.npz"
    assert ck.exists()

    out3 = tmp_path / "resumed"
    main([
        "--source_path", str(scene_root), "--model_path", str(out3),
        "--eval", "--iterations", "8", "--capacity", "64",
        "--pair_budget", "4096", "--chunk_size", "32",
        "--start_checkpoint", str(ck), "--save_iterations", "8", "--quiet",
    ])
    assert (out3 / "point_cloud" / "iteration_8" / "point_cloud.ply").exists()


def test_kept_frac_cli(trained_model, tmp_path):
    """--kept_frac < 1 trains end-to-end and logs culled-pair telemetry."""
    scene_root, _ = trained_model
    out = tmp_path / "model_kept"

    from gsplat_tpu.cli import main

    main([
        "--source_path", str(scene_root), "--model_path", str(out),
        "--iterations", "100", "--capacity", "64",
        "--pair_budget", "4096", "--chunk_size", "32", "--kept_frac", "0.9",
        "--quiet",
    ])
    lines = [json.loads(l) for l in open(out / "metrics.jsonl")]
    steps = [l for l in lines if "n_culled_pairs" in l]
    assert steps, "no per-step telemetry logged"
    assert all(l["n_dropped_pairs"] == 0 for l in steps)


def test_collective_overlap_flag_dedup(monkeypatch):
    """Whole-token dedup: a preset long flag must not suppress its prefix."""
    import os

    from gsplat_tpu.dist.mesh import enable_collective_overlap

    monkeypatch.setenv(
        "LIBTPU_INIT_ARGS",
        "--xla_tpu_enable_async_collective_fusion_fuse_all_gather=false",
    )
    enable_collective_overlap()
    toks = os.environ["LIBTPU_INIT_ARGS"].split()
    assert "--xla_tpu_enable_async_collective_fusion=true" in toks
    assert "--xla_tpu_enable_latency_hiding_scheduler=true" in toks
    # the user's explicit setting is preserved, not duplicated
    assert toks.count(
        "--xla_tpu_enable_async_collective_fusion_fuse_all_gather=false") == 1
    assert not any(
        t.startswith("--xla_tpu_enable_async_collective_fusion_fuse") and
        t.endswith("true") for t in toks)


def test_full_eval(tmp_path):
    """full_eval orchestrates train -> render -> metrics over scene lists
    (upstream full_eval.py surface)."""
    from tests.fixtures import make_colmap_scene
    from gsplat_tpu.full_eval import main

    s1 = tmp_path / "sceneA"
    s2 = tmp_path / "sceneB"
    make_colmap_scene(s1, n_cams=5, width=48, height=32, n_points=30)
    make_colmap_scene(s2, n_cams=5, width=48, height=32, n_points=30)
    out = tmp_path / "eval"
    assert main([
        "--scenes", str(s1), str(s2), "-o", str(out),
        "--iterations", "6", "--capacity", "64",
        "--pair_budget", "4096", "--chunk_size", "32",
    ]) == 0
    summary = json.loads((out / "full_eval.json").read_text())
    assert set(summary) == {"sceneA", "sceneB"}
    for scene in summary.values():
        assert scene["test/ours_6"]["PSNR"] is not None


def test_contrib_frac_cli(trained_model, tmp_path):
    """--contrib_frac < 1 sizes the backward compaction budget; training
    completes (regrowing adaptively if a step overflows) and the per-step
    contributing-pair telemetry lands in metrics.jsonl."""
    scene_root, _ = trained_model
    out = tmp_path / "model_contrib"

    from gsplat_tpu.cli import main

    main([
        "--source_path", str(scene_root), "--model_path", str(out),
        "--iterations", "100", "--capacity", "64",
        "--pair_budget", "4096", "--chunk_size", "32",
        "--contrib_frac", "0.25", "--quiet",
    ])
    lines = [json.loads(l) for l in open(out / "metrics.jsonl")]
    steps = [l for l in lines if "n_contrib_pairs" in l]
    assert steps, "no per-step contrib telemetry logged"
    assert all(l["n_contrib_pairs"] >= 0 for l in steps)
    assert (out / "point_cloud" / "iteration_100" / "point_cloud.ply").exists()


def test_sat_frac_cli(trained_model, tmp_path):
    """--sat_frac > 0 enables the saturation bound cull in the trainer;
    training completes (regrowing the survivor budget adaptively) with
    per-step n_sat telemetry in metrics.jsonl."""
    scene_root, _ = trained_model
    out = tmp_path / "model_sat"

    from gsplat_tpu.cli import main

    main([
        "--source_path", str(scene_root), "--model_path", str(out),
        "--iterations", "100", "--capacity", "64",
        "--pair_budget", "4096", "--chunk_size", "32",
        "--sat_frac", "0.25", "--quiet",
    ])
    lines = [json.loads(l) for l in open(out / "metrics.jsonl")]
    steps = [l for l in lines if "n_sat_pairs" in l]
    assert steps, "no per-step sat telemetry logged"
    assert all(l["n_sat_pairs"] >= 0 for l in steps)
    assert (out / "point_cloud" / "iteration_100" / "point_cloud.ply").exists()
