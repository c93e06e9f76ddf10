"""Persistent-compile-cache determinism probe (VERDICT r4 ask #1).

Round-4 measured that at least two of the trainer's jit executables MISS the
persistent compilation cache on every rerun with identical code — 12-17 min
of axon-tunnel compile each — while others hit in seconds. The cache key is
sha256(canonicalized StableHLO + jaxlib version + backend + compile options),
so a repeated miss means one of those inputs is NONDETERMINISTIC across
processes. This probe isolates it cheaply:

    python scripts/cache_probe.py /tmp/cache_probe [--runs 3] [--iters 60]

It builds a tiny synthetic COLMAP scene once, then runs the UNCHANGED CLI
trainer N times in fresh subprocesses (fresh PYTHONHASHSEED each) against a
shared fresh cache dir, with JAX_LOG_COMPILES + JAX_EXPLAIN_CACHE_MISSES so
every persistent-cache hit/miss logs its module name and key. Schedule knobs
are chosen so the run traces every trainer executable class: initial step,
adaptive-budget refit steps, sat probe, densify, opacity reset, eval.

Output: per-module key sets across runs, and a verdict line per module —
STABLE (same key every run) or NONDETERMINISTIC (key varies). Exit code 1 if
any module is nondeterministic. Runs on CPU by default (the key's
computation + compile-options hash are computed identically there; a
TPU-only instability can be re-probed with --platform tpu on the chip).
"""

import argparse
import json
import os
import re
import shutil
import subprocess
import sys
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

HITMISS = re.compile(
    r"(Persistent compilation cache hit|PERSISTENT COMPILATION CACHE MISS)"
    r" for '([^']+)' with key '([^']+)'"
)


def run_child(scene: Path, out: Path, cache: Path, iters: int, seed: int,
              platform: str) -> list:
    env = dict(os.environ)
    env.update(
        PYTHONHASHSEED=str(seed),  # exercise str-hash-order sensitivity
        GSPLAT_CACHE_DIR=str(cache),
        GSPLAT_CACHE_MIN_SECS="0",
        JAX_LOG_COMPILES="1",
        JAX_EXPLAIN_CACHE_MISSES="1",
        # surface the skipped-write reasons (host callbacks, min size/time)
        JAX_DEBUG_LOG_MODULES="jax._src.compilation_cache",
        # "tpu" = the default backend (the axon-tunneled chip) — forcing
        # jax_platforms="tpu" would look for a LOCAL chip and fail
        GSPLAT_FORCE_PLATFORM="" if platform == "tpu" else platform,
    )
    chunk = "128" if platform == "tpu" else "32"  # TPU DMA: chunk % 128 == 0
    cmd = [
        sys.executable, "-m", "gsplat_tpu.cli",
        "--source_path", str(scene), "--model_path", str(out),
        "--eval", "--iterations", str(iters),
        "--capacity", "256", "--pair_budget", "4096", "--chunk_size", chunk,
        "--test_iterations", str(iters // 2),
        "--save_iterations", str(iters),
        "--checkpoint_iterations", str(iters),
        "--densify_from_iter", "10", "--densification_interval", "20",
        "--opacity_reset_interval", str(iters - 5),
        "--quiet",
    ]
    p = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True, text=True,
                       timeout=3600)
    if p.returncode != 0:
        sys.stderr.write(p.stdout[-3000:] + p.stderr[-5000:])
        raise SystemExit(f"child trainer failed rc={p.returncode}")
    events = []
    for line in p.stderr.splitlines():
        m = HITMISS.search(line)
        if m:
            events.append(
                ("hit" if "hit" in m.group(1) else "miss",
                 m.group(2), m.group(3))
            )
        elif "Not writing persistent cache entry" in line:
            print("  " + line.strip())
    return events


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root", type=Path)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--keep_cache", action="store_true",
                    help="reuse an existing cache dir (probe warm-start)")
    ns = ap.parse_args()

    scene = ns.root / "scene"
    cache = ns.root / "cache"
    if not (scene / "sparse").exists():
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        subprocess.run(
            [sys.executable, "-c",
             "import sys; sys.path[:0]=[%r,%r];" % (str(REPO), str(REPO / "tests"))
             + "import jax; jax.config.update('jax_platforms','cpu');"
             "from fixtures import make_colmap_scene; from pathlib import Path;"
             "make_colmap_scene(Path(%r), n_cams=6, width=64, height=48,"
             " n_points=80)" % str(scene)],
            cwd=REPO, env=env, check=True)
    if cache.exists() and not ns.keep_cache:
        shutil.rmtree(cache)
    cache.mkdir(parents=True, exist_ok=True)

    # module -> list over runs of the ordered key list (a module name can
    # legitimately compile several times per run at different budgets)
    keys_by_run: list = []
    for r in range(ns.runs):
        out = ns.root / f"out_run{r}"
        if out.exists():
            shutil.rmtree(out)
        events = run_child(scene, out, cache, ns.iters, seed=1000 + 7 * r,
                           platform=ns.platform)
        per_mod = defaultdict(list)
        for kind, mod, key in events:
            per_mod[mod].append((kind, key))
        keys_by_run.append(dict(per_mod))
        n_miss = sum(1 for k, _, _ in events if k == "miss")
        print(f"run {r}: {len(events)} cache events, {n_miss} misses")

    verdicts = {}
    bad = False
    mods = sorted({m for run in keys_by_run for m in run})
    for mod in mods:
        seqs = [tuple(k for _, k in run.get(mod, [])) for run in keys_by_run]
        stable = all(s == seqs[0] for s in seqs[1:])
        # runs after the first must be all-hit for a deterministic key
        later_misses = sum(
            1 for run in keys_by_run[1:] for kind, _ in run.get(mod, [])
            if kind == "miss"
        )
        verdicts[mod] = {
            "stable_keys": stable,
            "later_run_misses": later_misses,
            "keys": [list(s) for s in seqs],
        }
        flag = "STABLE" if (stable and later_misses == 0) else "NONDETERMINISTIC"
        if flag != "STABLE":
            bad = True
        print(f"{flag:17s} {mod}: {len(seqs[0])} compiles/run, "
              f"{later_misses} later-run misses")

    (ns.root / "cache_probe.json").write_text(json.dumps(verdicts, indent=1))
    print(f"verdict written to {ns.root / 'cache_probe.json'}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
