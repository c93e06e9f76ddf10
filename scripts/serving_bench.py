"""Serving benchmark: forward-only render throughput (FPS) at 1M Gaussians.

The training bench (bench.py) prices fwd+bwd; serving/viewer workloads run
the forward path only — no backward d-array, no gradient reduction, and the
per-pair attribute table may ride the 8-column bf16-packed layout
(GSPLAT_PACK, quality-gated OUT of training but sanctioned for read-only
inference — see raster_pallas notes). Reports synced and pipelined
frames/sec at 1080p for the sparse (trained-like) and dense scene configs.

    python scripts/serving_bench.py [--pack] [--iters 10]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import os

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("GSPLAT_CACHE_DIR",
                   str(Path(__file__).resolve().parents[1] / ".jax_cache")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from gsplat_tpu.cache_keys import install_stable_kernel_keys

install_stable_kernel_keys()

import jax.numpy as jnp


def time_render(cam, g, bg, *, tile_size, chunk, pair_budget, kept_budget,
                sat_budget, attr_pack, iters):
    from gsplat_tpu.render.render import render

    @jax.jit
    def fwd(g):
        out = render(cam, g, bg, tile_size=tile_size, chunk=chunk,
                     pair_budget=pair_budget, kept_budget=kept_budget,
                     sat_budget=sat_budget, attr_pack=attr_pack)
        return out.image, out.n_dropped

    c = fwd.lower(g).compile()
    img, nd = jax.block_until_ready(c(g))
    assert int(nd) == 0, int(nd)
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        float(c(g)[0][0, 0, 0])
        best = min(best, time.time() - t0)
    t0 = time.time()
    for _ in range(10):
        out = c(g)
    float(out[0][0, 0, 0])
    pipe = (time.time() - t0) / 10
    return best, pipe


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--pack", action="store_true",
                    help="8-column bf16-packed attr table (serving-sanctioned)")
    ns = ap.parse_args()

    from bench import build_scene
    from gsplat_tpu.render.binning import bin_gaussians
    from gsplat_tpu.render.project import project_gaussians

    W, H = 1920, 1080
    out = {"n_gaussians": ns.n, "resolution": f"{W}x{H}",
           "attr_pack": bool(ns.pack),
           "device": jax.devices()[0].device_kind}
    for name, ppg, budget in (("sparse", 2.25, 5 << 19),
                              ("dense", 33.0, 5 << 23)):
        g, cam = build_scene(ns.n, W, H, target_pairs_per_gaussian=ppg,
                             tile_size=32)
        bg = jnp.zeros(3, jnp.float32)

        # fit the budgets from probe binnings (the trainer's steady state):
        # first the kept count, then the sat survivor count at that kept
        # budget (the sat machinery needs kept < 2^25 for its exact cumsum)
        @jax.jit
        def probe1(g):
            p = project_gaussians(g, cam)
            b = bin_gaussians(
                jax.lax.stop_gradient(p.mean2d), p.radius, p.depth,
                width=W, height=H, tile_size=32, chunk=128,
                pair_budget=budget, cull_conic=p.conic, cull_opacity=p.opacity,
                kept_budget=budget - 128,  # < pair_budget engages the cull
            )
            return b.n_pairs, b.n_culled
        np_, nc_ = (int(x) for x in jax.block_until_ready(probe1(g)))
        pair_fit = min(-(-np_ // 128) * 128 + 128, budget)
        kept = -(-(np_ - nc_ + 128) // 128) * 128

        @jax.jit
        def probe2(g):
            p = project_gaussians(g, cam)
            b = bin_gaussians(
                jax.lax.stop_gradient(p.mean2d), p.radius, p.depth,
                width=W, height=H, tile_size=32, chunk=128,
                pair_budget=pair_fit, cull_conic=p.conic,
                cull_opacity=p.opacity, kept_budget=kept, sat_budget=kept,
            )
            return b.n_sat
        nsat = int(jax.block_until_ready(probe2(g)))
        sat = (-(-nsat // 128) * 128 + 128) if 2 * nsat < (np_ - nc_) else None
        print(f"{name}: pairs {np_} kept {np_-nc_} sat {nsat}",
              file=sys.stderr, flush=True)
        best, pipe = time_render(
            cam, g, bg, tile_size=32, chunk=128, pair_budget=pair_fit,
            kept_budget=kept, sat_budget=sat, attr_pack=ns.pack or None,
            iters=ns.iters)
        out[f"{name}_ms"] = round(best * 1000, 2)
        out[f"{name}_fps"] = round(1.0 / best, 1)
        out[f"{name}_pipelined_ms"] = round(pipe * 1000, 2)
        out[f"{name}_pipelined_fps"] = round(1.0 / pipe, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    raise SystemExit(main())
