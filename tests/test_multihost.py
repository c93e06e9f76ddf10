"""Multi-host integration: the CLI runs unchanged under 2 REAL processes
(jax.distributed over localhost), with per-process camera-batch rows fed via
jax.make_array_from_process_local_data (SURVEY.md §7 M6; VERDICT r1 item 3).

Spawns two subprocesses (4 virtual CPU devices each -> 8-device global mesh)
running scripts/multihost_smoke.py, which drives gsplat_tpu.cli.main.
"""

import json
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np

from tests.fixtures import make_colmap_scene

REPO = Path(__file__).resolve().parents[1]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_cli(tmp_path):
    scene = tmp_path / "scene"
    make_colmap_scene(scene, n_cams=8, width=48, height=32, n_points=40)
    port = _free_port()

    procs = []
    for pid in range(2):
        out = tmp_path / f"out{pid}"
        procs.append(
            subprocess.Popen(
                [sys.executable, str(REPO / "scripts" / "multihost_smoke.py"),
                 str(pid), "2", str(port), str(scene), str(out)],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
                cwd=str(REPO),
            )
        )
    outs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(stdout)
    for pid, (p, stdout) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{stdout[-4000:]}"
        assert f"process {pid}: rows" in stdout

    # only process 0 writes host-side artifacts
    assert (tmp_path / "out0" / "metrics.jsonl").exists()
    assert not (tmp_path / "out1" / "metrics.jsonl").exists()
    # the SPMD multihost loss must match a single-process 8-device run of the
    # exact same config (same seeds -> same camera picks)
    single_out = tmp_path / "single"
    rc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "multihost_smoke.py"),
         "0", "1", str(_free_port()), str(scene), str(single_out)],
        capture_output=True, text=True, timeout=420, cwd=str(REPO),
    )
    assert rc.returncode == 0, rc.stdout[-4000:] + rc.stderr[-2000:]

    # the final model must match: same seeds -> same picks -> same math on a
    # 2-process mesh as on the 1-process 8-device mesh
    from gsplat_tpu.io.ply import load_gaussian_ply

    ply = "point_cloud/iteration_4/point_cloud.ply"
    multi = load_gaussian_ply(tmp_path / "out0" / ply)
    single = load_gaussian_ply(single_out / ply)
    np.testing.assert_allclose(multi["xyz"], single["xyz"], atol=1e-6)
    np.testing.assert_allclose(multi["opacity"], single["opacity"], atol=1e-6)


def test_two_process_sharded_cli(tmp_path):
    """Multi-host x --shard_gaussians (VERDICT r4 ask #5): the ZeRO-sharded
    trainer's gather -> densify -> reshard cycle and an eval, under
    jax.distributed with 2 REAL processes, must match the single-process
    sharded run on the same 8-device mesh bit-close."""
    scene = tmp_path / "scene"
    make_colmap_scene(scene, n_cams=8, width=48, height=32, n_points=40)

    # 6 iters crossing a densify event (iters 2/4/6) and an eval (iter 3);
    # capacity 64 % data_axis 4 == 0 as --shard_gaussians requires
    extra = [
        "--shard_gaussians", "--eval", "--iterations", "6",
        "--densify_from_iter", "1", "--densification_interval", "2",
        "--test_iterations", "3", "--save_iterations", "6",
    ]

    port = _free_port()
    procs = []
    for pid in range(2):
        out = tmp_path / f"shard_out{pid}"
        procs.append(
            subprocess.Popen(
                [sys.executable, str(REPO / "scripts" / "multihost_smoke.py"),
                 str(pid), "2", str(port), str(scene), str(out)] + extra,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
                cwd=str(REPO),
            )
        )
    outs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(stdout)
    for pid, (p, stdout) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{stdout[-4000:]}"
        # --quiet suppresses the "ZeRO-sharded Gaussians" banner; completion +
        # the row-ownership postcondition prove the run went through
        assert f"process {pid}: rows" in stdout

    # eval ran under the sharded multihost config (process 0 logs it)
    metrics = [json.loads(l)
               for l in (tmp_path / "shard_out0" / "metrics.jsonl").open()]
    assert any("test_psnr" in m for m in metrics), metrics

    single_out = tmp_path / "shard_single"
    rc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "multihost_smoke.py"),
         "0", "1", str(_free_port()), str(scene), str(single_out)] + extra,
        capture_output=True, text=True, timeout=600, cwd=str(REPO),
    )
    assert rc.returncode == 0, rc.stdout[-4000:] + rc.stderr[-2000:]

    from gsplat_tpu.io.ply import load_gaussian_ply

    ply = "point_cloud/iteration_6/point_cloud.ply"
    multi = load_gaussian_ply(tmp_path / "shard_out0" / ply)
    single = load_gaussian_ply(single_out / ply)
    # densify fired: the model grew past its 40-point init
    assert multi["xyz"].shape[0] > 40, multi["xyz"].shape
    np.testing.assert_allclose(multi["xyz"], single["xyz"], atol=1e-6)
    np.testing.assert_allclose(multi["opacity"], single["opacity"], atol=1e-6)
