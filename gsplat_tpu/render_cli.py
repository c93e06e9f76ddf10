"""Render-sets CLI: render every train/test camera of a trained model to PNG.

Equivalent of upstream 3DGS's `render.py` (absent in the reference — SURVEY.md §0
lists "the render/eval scripts" under 'Absent entirely'). Usage:

    python -m gsplat_tpu.render_cli --model_path <out> [--iteration -1]
        [--skip_train] [--skip_test]

Writes <model>/{train,test}/ours_<iter>/{renders,gt}/NNNNN.png.
"""

from __future__ import annotations

import sys
from pathlib import Path
from typing import List, Optional

import numpy as np


def save_png(path: Path, img: np.ndarray) -> None:
    from PIL import Image as PILImage

    path.parent.mkdir(parents=True, exist_ok=True)
    arr = (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    PILImage.fromarray(arr).save(path)


def render_set(model_path: Path, name: str, iteration: int, cams, g, bg, mesh) -> None:
    import jax.numpy as jnp

    from gsplat_tpu.render.render import render

    base = model_path / name / f"ours_{iteration}"
    budget = mesh.pair_budget
    idx = 0
    while idx < len(cams):
        cam = cams[idx]
        out = render(
            cam, g, jnp.asarray(bg, jnp.float32),
            tile_size=mesh.tile_size, chunk=mesh.chunk_size,
            pair_budget=budget,
        )
        if int(out.n_dropped) > 0:
            # dropped pairs = silently wrong render; grow and redo this camera
            budget *= 2
            print(f"[{name}] {int(out.n_dropped)} pairs dropped; "
                  f"pair budget -> {budget} (recompiling)", flush=True)
            continue
        save_png(base / "renders" / f"{idx:05d}.png", np.asarray(out.image))
        if cam.image is not None:
            save_png(base / "gt" / f"{idx:05d}.png", np.asarray(cam.image))
        idx += 1
        print(f"[{name}] rendered {idx}/{len(cams)}", flush=True)


def main(argv: Optional[List[str]] = None) -> int:
    import argparse

    import os

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("GSPLAT_CACHE_DIR", "/tmp/jax_cache_gsplat"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from gsplat_tpu.cache_keys import install_stable_kernel_keys

    install_stable_kernel_keys()  # line-number-independent kernel cache keys

    from gsplat_tpu.config import MeshParams, ModelParams
    from gsplat_tpu.scene import Scene

    p = argparse.ArgumentParser(prog="gsplat-tpu-render")
    p.add_argument("--model_path", required=True)
    p.add_argument("--source_path", default="")
    p.add_argument("--iteration", type=int, default=-1)
    p.add_argument("--sh_degree", type=int, default=3)
    p.add_argument("--resolution", type=int, default=-1)
    p.add_argument("--white_background", action="store_true")
    p.add_argument("--eval", action="store_true", default=True)
    p.add_argument("--skip_train", action="store_true")
    p.add_argument("--skip_test", action="store_true")
    p.add_argument("--pair_budget", type=int, default=1 << 20)
    p.add_argument("--tile_size", type=int, default=32)
    p.add_argument("--chunk_size", type=int, default=128)
    ns = p.parse_args(argv)

    source = ns.source_path
    if not source:
        # recover from cfg_args (written at train time, upstream-compatible)
        cfg = (Path(ns.model_path) / "cfg_args").read_text()
        import re

        m = re.search(r"source_path='([^']*)'", cfg)
        if not m:
            raise SystemExit("--source_path not given and not found in cfg_args")
        source = m.group(1)

    model = ModelParams(
        sh_degree=ns.sh_degree, source_path=source, model_path=ns.model_path,
        resolution=ns.resolution, white_background=ns.white_background, eval=ns.eval,
    )
    mesh = MeshParams(pair_budget=ns.pair_budget, tile_size=ns.tile_size,
                      chunk_size=ns.chunk_size)
    scene = Scene(model, load_iteration=ns.iteration, shuffle=False)
    g = scene.gaussians
    bg = [1.0, 1.0, 1.0] if ns.white_background else [0.0, 0.0, 0.0]

    if not ns.skip_train:
        render_set(Path(ns.model_path), "train", scene.loaded_iter,
                   scene.get_train_cameras(), g, bg, mesh)
    if not ns.skip_test:
        render_set(Path(ns.model_path), "test", scene.loaded_iter,
                   scene.get_test_cameras(), g, bg, mesh)
    return 0


if __name__ == "__main__":
    sys.exit(main())
