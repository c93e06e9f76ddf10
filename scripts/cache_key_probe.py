"""TPU cache-KEY determinism probe — no compilation, tunnel-free.

The persistent-cache key is sha256(canonicalized StableHLO + jaxlib version +
backend + compile options). scripts/cache_probe.py showed the CPU lowering is
fully deterministic, so the round-4 rerun misses must come from the TPU
lowering path (where the Pallas kernels serialize Mosaic payloads into
custom-call backend_configs) or from TPU compile options. This probe LOWERS
the trainer's executables on the real backend (lowering is client-side; no
12-min tunnel compiles involved), canonicalizes the IR exactly the way
jax._src.cache_key does, and compares hashes across fresh processes:

    python scripts/cache_key_probe.py /tmp/key_probe [--runs 3] [--platform tpu]

On mismatch, per-run stripped-IR text dumps land in <root>/run<N>/ for a
plain `diff`. Exit 1 if any executable's canonical IR varies across runs.
"""

import argparse
import hashlib
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def child(root: Path, platform: str) -> None:
    sys.path.insert(0, str(REPO))
    sys.path.insert(0, str(REPO / "tests"))
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    import jax.numpy as jnp
    import numpy as np
    from jax._src import cache_key as ck

    from gsplat_tpu.config import MeshParams, OptimizationParams
    from gsplat_tpu.core.camera import make_camera
    from gsplat_tpu.core.gaussians import create_from_pcd
    from gsplat_tpu.train.densify import densify_and_prune, reset_opacity
    from gsplat_tpu.train.loop import _sat_probe, eval_step, make_train_step
    from gsplat_tpu.train.optim import init_adam_state
    from tests.fixtures import look_at_rig

    W, H = 64, 48
    rng = np.random.default_rng(0)
    n = 40
    g = create_from_pcd(rng.normal(size=(n, 3)) * 0.5, rng.random((n, 3)),
                        capacity=256)
    (R, T), = look_at_rig(1)
    img = np.zeros((H, W, 3), np.float32)
    cam = make_camera(R, T, fovx=0.9, fovy=0.7, width=W, height=H, image=img)
    bg = jnp.zeros(3)
    opt = OptimizationParams()
    mesh = MeshParams(tile_size=16, chunk_size=128, pair_budget=4096)
    opt_state = init_adam_state(g.params())
    step_i = jnp.asarray(5, jnp.int32)
    ema = jnp.zeros((), jnp.float32)

    train_step = make_train_step(opt, mesh, 1.0, W, H)
    train_step_fit = make_train_step(opt, mesh, 1.0, W, H,
                                     contrib_budget=2048, sat_budget=1024,
                                     kept_budget=2048)

    lowerings = {
        "train_step": lambda: train_step.lower(g, opt_state, cam, bg, step_i,
                                               ema),
        "train_step_fitted": lambda: train_step_fit.lower(
            g, opt_state, cam, bg, step_i, ema),
        "eval_step": lambda: eval_step.lower(
            g, cam, bg, lambda_dssim=0.2, tile_size=16, chunk=128,
            pair_budget=4096),
        "sat_probe": lambda: _sat_probe.lower(
            g, cam, bg, tile_size=16, chunk=128, pair_budget=4096),
        "densify_and_prune": lambda: jax.jit(densify_and_prune).lower(
            g, opt_state, jax.random.PRNGKey(3), max_grad=0.0002,
            min_opacity=0.005, extent=1.0, max_screen_size=20.0,
            percent_dense=0.01),
        "reset_opacity": lambda: jax.jit(reset_opacity).lower(g, opt_state),
    }

    out = {}
    root.mkdir(parents=True, exist_ok=True)
    for name, fn in lowerings.items():
        lowered = fn()
        module = lowered.compiler_ir(dialect="stablehlo")
        canon = ck._canonicalize_ir(module, ck.IgnoreCallbacks.NO)
        out[name] = hashlib.sha256(canon).hexdigest()
        # readable dump for diffing a mismatch
        with module.context:
            from jax._src.lib.mlir import passmanager as pm

            m = module.operation.clone()
            pm.PassManager.parse("builtin.module(strip-debuginfo)").run(m)
            (root / f"{name}.stablehlo.txt").write_text(
                m.get_asm(large_elements_limit=64)
            )
    (root / "hashes.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root", type=Path)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--platform", default="",
                    help="'' = default backend (axon TPU), or cpu")
    ap.add_argument("--child", action="store_true")
    ns = ap.parse_args()

    if ns.child:
        child(ns.root, ns.platform)
        return 0

    hashes = []
    for r in range(ns.runs):
        env = dict(os.environ, PYTHONHASHSEED=str(1000 + 7 * r))
        run_dir = ns.root / f"run{r}"
        p = subprocess.run(
            [sys.executable, __file__, str(run_dir), "--child",
             "--platform", ns.platform],
            cwd=REPO, env=env, capture_output=True, text=True, timeout=1800)
        if p.returncode != 0:
            sys.stderr.write(p.stdout[-2000:] + p.stderr[-5000:])
            raise SystemExit(f"child failed rc={p.returncode}")
        hashes.append(json.loads(p.stdout.strip().splitlines()[-1]))
        print(f"run {r}: {hashes[-1]}")

    bad = False
    for name in hashes[0]:
        vals = {h[name] for h in hashes}
        flag = "STABLE" if len(vals) == 1 else "NONDETERMINISTIC"
        if len(vals) > 1:
            bad = True
        print(f"{flag:17s} {name}")
    if bad:
        print(f"diff the mismatching dumps under {ns.root}/run*/")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
