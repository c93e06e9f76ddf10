"""Validate cache_keys.install_stable_kernel_keys on the real backend.

Reproduces the round-4 rerun-miss mechanism exactly: two subprocesses lower
the SAME eval_step from copies of the package tree that differ only in
blank lines prepended to train/loop.py (shifting every downstream source
location). The Mosaic kernel payloads inside `tpu_custom_call`
backend_configs embed call-stack file:line (verified by decoding a payload:
cli.py / loop.py / render.py / binning.py / raster_pallas.py all appear),
which JAX's strip-debuginfo canonicalization cannot reach — so without the
patch the canonical IR (and the persistent cache key) differs; with
GSPLAT_STRIP_KERNEL_LOCS=1 (default) it must be identical.

    python scripts/kernel_key_probe.py          # expect: STABLE + OK

Exit 0 iff patched-stable and unpatched-unstable are both observed.
"""

import json
import os
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

CHILD = r'''
import hashlib, json, sys
from gsplat_tpu.cache_keys import install_stable_kernel_keys
active = install_stable_kernel_keys()
import jax, jax.numpy as jnp
import numpy as np
from jax._src import cache_key as ck
from gsplat_tpu.config import MeshParams, OptimizationParams
from gsplat_tpu.core.camera import make_camera
from gsplat_tpu.core.gaussians import create_from_pcd
from gsplat_tpu.train.loop import eval_step

rng = np.random.default_rng(0)
g = create_from_pcd(rng.normal(size=(40, 3)) * 0.5, rng.random((40, 3)),
                    capacity=256)
R = np.eye(3); T = np.array([0.0, 0.0, 4.0])
cam = make_camera(R, T, fovx=0.9, fovy=0.7, width=64, height=48,
                  image=np.zeros((48, 64, 3), np.float32))
low = eval_step.lower(g, cam, jnp.zeros(3), lambda_dssim=0.2, tile_size=16,
                      chunk=128, pair_budget=4096)
m = low.compiler_ir(dialect="stablehlo")
canon = ck._canonicalize_ir(m, ck.IgnoreCallbacks.NO)
print(json.dumps({"active": active,
                  "sha": hashlib.sha256(canon).hexdigest()}))
'''


def run_child(tree: Path, strip: str) -> dict:
    # prepend: the axon sitecustomize rides the inherited PYTHONPATH
    pp = os.environ.get("PYTHONPATH", "")
    env = dict(os.environ, GSPLAT_STRIP_KERNEL_LOCS=strip,
               PYTHONPATH=str(tree) + (os.pathsep + pp if pp else ""))
    p = subprocess.run([sys.executable, "-c", CHILD], env=env, cwd=str(tree),
                       capture_output=True, text=True, timeout=900)
    if p.returncode != 0:
        sys.stderr.write(p.stdout[-2000:] + p.stderr[-4000:])
        raise SystemExit("child failed")
    return json.loads(p.stdout.strip().splitlines()[-1])


def main() -> int:
    results = {}
    with tempfile.TemporaryDirectory() as td:
        for i, pad in enumerate((0, 37)):
            tree = Path(td) / f"tree{i}"
            shutil.copytree(REPO / "gsplat_tpu", tree / "gsplat_tpu")
            lp = tree / "gsplat_tpu" / "train" / "loop.py"
            lp.write_text("\n" * pad + lp.read_text())
            for strip in ("1", "0"):
                r = run_child(tree, strip)
                results[(i, strip)] = r
                print(f"tree{i} (pad {pad}) strip={strip}: active={r['active']} "
                      f"sha={r['sha'][:16]}")
    patched_stable = results[(0, "1")]["sha"] == results[(1, "1")]["sha"]
    unpatched_stable = results[(0, "0")]["sha"] == results[(1, "0")]["sha"]
    print(f"patched_stable={patched_stable} unpatched_stable={unpatched_stable}")
    ok = patched_stable and not unpatched_stable
    print("OK" if ok else "UNEXPECTED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
