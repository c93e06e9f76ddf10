"""On-device training self-check: synthesize a scene whose ground-truth images come
from the renderer itself, then train from a perturbed initialization and verify
PSNR climbs. Exercises the full system end-to-end on real hardware (render ->
loss -> Pallas VJP -> Adam -> densify -> eval) — BASELINE config-0-style smoke,
but on TPU and self-consistent.

    python scripts/selfcheck_train.py [--iters 600] [--size 256] [--n_gt 2000]
"""

import argparse
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_selfcheck")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from gsplat_tpu.cache_keys import install_stable_kernel_keys

install_stable_kernel_keys()  # line-number-independent kernel cache keys

import jax.numpy as jnp
import numpy as np


def gt_scene(n, seed=0):
    """Ground-truth Gaussians: colorful blobs on a sphere shell + core cluster."""
    from gsplat_tpu.core.gaussians import create_from_pcd

    rng = np.random.default_rng(seed)
    shell = rng.normal(size=(n // 2, 3))
    shell /= np.linalg.norm(shell, axis=1, keepdims=True)
    core = rng.normal(size=(n - n // 2, 3)) * 0.3
    pts = np.concatenate([shell, core])
    colors = np.concatenate([
        (pts[: n // 2] + 1) / 2,                     # position-coded colors
        rng.random((n - n // 2, 3)),
    ])
    cap = 1 << max(13, int(np.ceil(np.log2(n + 1))))
    g = create_from_pcd(pts, colors, capacity=cap)
    # make them solid
    g = g.replace(
        opacity=jnp.where(g.live_mask[:, None], 2.0, g.opacity),
        scaling=jnp.where(g.live_mask[:, None], jnp.log(0.06), g.scaling),
    )
    return g, pts, colors


def textured_scene(n, seed=0):
    """Harder ground truth for quality-proxy runs (VERDICT r1 item 10): many
    small solid Gaussians on surfaces (ground plane + sphere shell + torus)
    with high-frequency procedural colors — the closest in-repo stand-in for
    real photogrammetry texture until datasets exist."""
    from gsplat_tpu.core.gaussians import create_from_pcd

    rng = np.random.default_rng(seed)
    n_pl, n_sh = n // 3, n // 3
    n_to = n - n_pl - n_sh
    # ground plane y=-1.05, extent 2.4
    pl = np.stack([
        rng.uniform(-1.2, 1.2, n_pl),
        np.full(n_pl, -1.05) + rng.normal(0, 0.003, n_pl),
        rng.uniform(-1.2, 1.2, n_pl),
    ], 1)
    sh = rng.normal(size=(n_sh, 3))
    sh /= np.linalg.norm(sh, axis=1, keepdims=True)
    sh *= 0.75
    phi = rng.uniform(0, 2 * np.pi, n_to)
    theta = rng.uniform(0, 2 * np.pi, n_to)
    to = np.stack([
        (1.0 + 0.28 * np.cos(theta)) * np.cos(phi),
        0.28 * np.sin(theta) - 0.3,
        (1.0 + 0.28 * np.cos(theta)) * np.sin(phi),
    ], 1)
    pts = np.concatenate([pl, sh, to])
    # high-frequency color: trig interference + checker on the plane
    f = 9.0
    base = 0.5 + 0.5 * np.stack([
        np.sin(f * pts[:, 0]) * np.sin(f * 1.3 * pts[:, 2]),
        np.sin(f * 0.8 * pts[:, 1] + 2.1) * np.cos(f * pts[:, 0]),
        np.cos(f * 1.7 * pts[:, 2] + 0.7),
    ], 1)
    checker = ((np.floor(pts[:, 0] * 4) + np.floor(pts[:, 2] * 4)) % 2)[:, None]
    colors = np.clip(0.75 * base + 0.25 * checker, 0, 1)
    cap = 1 << int(np.ceil(np.log2(n + 1)))
    g = create_from_pcd(pts, colors, capacity=cap)
    g = g.replace(
        opacity=jnp.where(g.live_mask[:, None], 2.5, g.opacity),
        scaling=jnp.where(g.live_mask[:, None], jnp.log(0.012), g.scaling),
    )
    return g, pts, colors


def rig(n_cams, radius=3.5):
    out = []
    for i in range(n_cams):
        ang = 2 * math.pi * i / n_cams
        el = 0.35 * math.sin(3 * ang)
        pos = np.array([
            radius * math.cos(el) * math.sin(ang),
            radius * math.sin(el),
            radius * math.cos(el) * math.cos(ang),
        ])
        fwd = -pos / np.linalg.norm(pos)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd); right /= np.linalg.norm(right)
        R_w2c = np.stack([right, np.cross(fwd, right), fwd])
        out.append((R_w2c.T, -R_w2c @ pos))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=600)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--n_gt", type=int, default=2000)
    ap.add_argument("--n_cams", type=int, default=24)
    ap.add_argument("--pair_budget", type=int, default=1 << 18)
    ap.add_argument("--min_psnr", type=float, default=22.0)
    ns = ap.parse_args()

    from gsplat_tpu.config import MeshParams, OptimizationParams
    from gsplat_tpu.core.camera import make_camera
    from gsplat_tpu.core.gaussians import create_from_pcd
    from gsplat_tpu.render.render import render
    from gsplat_tpu.train.densify import densify_and_prune_jit
    from gsplat_tpu.train.loop import make_train_step
    from gsplat_tpu.train.loss import psnr
    from gsplat_tpu.train.optim import init_adam_state

    S = ns.size
    g_true, pts, colors = gt_scene(ns.n_gt)
    bg = jnp.zeros(3, jnp.float32)
    cams = []
    print("rendering ground truth...", flush=True)
    render_j = jax.jit(lambda c, gg: render(
        c, gg, bg, tile_size=16, chunk=128, pair_budget=ns.pair_budget).image)
    for R, T in rig(ns.n_cams):
        cam = make_camera(R, T, fovx=0.9, fovy=0.9, width=S, height=S)
        img = render_j(cam, g_true)
        cams.append(make_camera(R, T, fovx=0.9, fovy=0.9, width=S, height=S,
                                image=np.asarray(img)))

    # perturbed init: noisy positions, random colors, default opacity/scale
    rng = np.random.default_rng(1)
    g = create_from_pcd(
        pts + rng.normal(size=pts.shape) * 0.05,
        rng.random(colors.shape),
        capacity=1 << 13,
        spatial_lr_scale=3.5,
    )
    opt_state = init_adam_state(g.params())

    opt = OptimizationParams(
        iterations=ns.iters,
        densify_from_iter=100,
        densification_interval=150,
        densify_until_iter=ns.iters // 2,
        opacity_reset_interval=10 ** 9,  # skip resets in this short run
    )
    mesh = MeshParams(tile_size=16, chunk_size=128, pair_budget=ns.pair_budget)
    step_fn = make_train_step(opt, mesh, g.spatial_lr_scale, S, S)
    eval_j = jax.jit(lambda c, gg: psnr(render(
        c, gg, bg, tile_size=16, chunk=128, pair_budget=ns.pair_budget).image, c.image))

    def mean_psnr():
        return float(np.mean([float(eval_j(c, g)) for c in cams[::4]]))

    print(f"initial PSNR {mean_psnr():.2f}", flush=True)
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    ema = jnp.zeros((), jnp.float32)
    for it in range(1, ns.iters + 1):
        if it % 1000 == 0:
            g = g.oneup_sh_degree()
        cam = cams[(it * 7) % len(cams)]
        g, opt_state, loss, ema, n_pairs, n_dropped, _, _, _ = step_fn(
            g, opt_state, cam, bg, jnp.asarray(it, jnp.int32), ema
        )
        if it < opt.densify_until_iter and it > opt.densify_from_iter \
                and it % opt.densification_interval == 0:
            key, sub = jax.random.split(key)
            g, opt_state, _ = densify_and_prune_jit(
                g, opt_state, sub, max_grad=jnp.float32(opt.densify_grad_threshold),
                min_opacity=jnp.float32(0.005), extent=jnp.float32(3.5),
                max_screen_size=jnp.float32(0.0),
                percent_dense=jnp.float32(opt.percent_dense),
            )
        if it % 100 == 0:
            print(f"iter {it} loss {float(loss):.4f} gaussians {int(g.n_live)} "
                  f"({100 / (time.time() - t0):.1f} it/s)", flush=True)
            t0 = time.time()

    final = mean_psnr()
    print(f"final PSNR {final:.2f} (threshold {ns.min_psnr})", flush=True)
    if final < ns.min_psnr:
        print("FAIL: training did not converge", flush=True)
        return 1
    print("PASS", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
