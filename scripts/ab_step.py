"""Lean A/B timer for the sparse bench step (kept-budget pass only).

Compiles ONE fwd+bwd config (the bench's headline kept/contrib split, fitted
from a cheap binning probe) and prints synced + pipelined step times as a JSON
line. Use with the kernel env levers for A/B, e.g.:

    GSPLAT_TRANS=log  python scripts/ab_step.py
    GSPLAT_PACK=1     python scripts/ab_step.py
    python scripts/ab_step.py --chunk 256

Each lever changes the HLO, so expect a fresh (tunnel-priced) compile per
invocation; the repo-local .jax_cache makes repeats free.
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
    os.environ.get(
        "GSPLAT_CACHE_DIR",
        str(Path(__file__).resolve().parents[1] / ".jax_cache"),
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from gsplat_tpu.cache_keys import install_stable_kernel_keys

install_stable_kernel_keys()  # line-number-independent kernel cache keys

import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--size", type=int, nargs=2, default=[1920, 1080])
    ap.add_argument("--tile_size", type=int, default=32)
    ap.add_argument("--scene_tile", type=int, default=0,
                    help="tile size the scene's splat radii target (default: "
                         "--tile_size). Set to 32 when A/B-ing --tile_size so "
                         "the physical scene stays fixed.")
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--ppg", type=float, default=2.25)
    ap.add_argument("--pair_budget", type=int, default=5 << 19)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--attr_pack", type=int, default=-1,
                    help="-1 env default, 0 off, 1 on")
    ns = ap.parse_args()

    from bench import _time_pass, build_scene
    from gsplat_tpu.render.binning import bin_gaussians
    from gsplat_tpu.render.project import project_gaussians
    from gsplat_tpu.render.render import render
    from gsplat_tpu.train.loss import photometric_loss

    w, h = ns.size
    chunk = ns.chunk
    g, cam = build_scene(ns.n, w, h, target_pairs_per_gaussian=ns.ppg,
                         tile_size=ns.scene_tile or ns.tile_size)
    bg = jnp.zeros(3, jnp.float32)
    pack = None if ns.attr_pack < 0 else bool(ns.attr_pack)

    @jax.jit
    def probe(g):
        proj = project_gaussians(g, cam)
        b = bin_gaussians(
            proj.mean2d, proj.radius, proj.depth, width=w, height=h,
            tile_size=ns.tile_size, chunk=chunk, pair_budget=ns.pair_budget,
            cull_conic=proj.conic, cull_opacity=proj.opacity,
            kept_budget=ns.pair_budget - chunk,
        )
        return b.n_pairs, b.n_culled

    print("probing...", file=sys.stderr, flush=True)
    np_p, nc_p = jax.block_until_ready(probe(g))
    pair_fit = -(-int(np_p) // chunk) * chunk + chunk
    kept = -(-int(int(np_p) - int(nc_p) + chunk) // chunk) * chunk

    def fwd_bwd(g, contrib):
        def loss_fn(params):
            out = render(
                cam, g.with_params(params), bg, tile_size=ns.tile_size,
                chunk=chunk, pair_budget=pair_fit, kept_budget=kept,
                contrib_budget=contrib, attr_pack=pack,
            )
            return photometric_loss(out.image, cam.image, 0.2), (
                out.n_dropped, out.n_contrib)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            g.params())
        return loss, aux[0], aux[1], grads["xyz"]

    # contrib probe at never-overflow capacity (one cheapish compile), then
    # the timed pass at the fitted split
    print("probing contrib...", file=sys.stderr, flush=True)
    cp = jax.jit(lambda g: fwd_bwd(g, None)[2]).lower(g).compile()
    n_contrib = int(jax.block_until_ready(cp(g)))
    contrib = -(-n_contrib // 512) * 512 + 512

    print(f"compiling kept pass (pair_fit={pair_fit} kept={kept} "
          f"contrib={contrib})", file=sys.stderr, flush=True)
    t0 = time.time()
    ck = jax.jit(lambda g: fwd_bwd(g, contrib)).lower(g).compile()
    compile_s = time.time() - t0
    loss, nd, nc, gx = jax.block_until_ready(ck(g))
    assert int(nd) == 0 and bool(jnp.isfinite(loss)), (int(nd), float(loss))
    assert bool(jnp.all(jnp.isfinite(gx)))
    best, pipelined = _time_pass(ck, g, ns.iters)
    print(json.dumps({
        "step_ms": round(best * 1000, 2), "pipelined_ms": pipelined,
        "loss": round(float(loss), 5), "pairs": int(np_p), "kept": kept,
        "contrib": contrib, "chunk": chunk,
        "trans": os.environ.get("GSPLAT_TRANS", "prod"),
        "pack": pack, "dg_comp": os.environ.get("GSPLAT_DG_COMP", "1"),
        "split_terms": os.environ.get("GSPLAT_SPLIT_TERMS", "2"),
        "compile_s": round(compile_s, 1),
    }))


if __name__ == "__main__":
    main()
