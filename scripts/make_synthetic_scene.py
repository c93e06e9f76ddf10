"""Write a self-consistent synthetic COLMAP dataset: ground-truth images are
rendered by the framework itself from a procedural Gaussian scene, so a full
training run can be validated end-to-end without external datasets.

    python scripts/make_synthetic_scene.py /tmp/synth --n_cams 32 --size 256
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out", type=Path)
    ap.add_argument("--n_cams", type=int, default=32)
    ap.add_argument("--size", type=int, default=256,
                    help="square size; or use --width/--height")
    ap.add_argument("--width", type=int, default=0)
    ap.add_argument("--height", type=int, default=0)
    ap.add_argument("--n_gt", type=int, default=2000)
    ap.add_argument("--textured", action="store_true",
                    help="high-frequency textured GT (quality-proxy runs)")
    ap.add_argument("--pair_budget", type=int, default=1 << 18)
    ap.add_argument("--noise", type=float, default=0.03,
                    help="std of noise added to the GT points written as points3D")
    ns = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_selfcheck")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from PIL import Image as PILImage

    from gsplat_tpu.core.camera import make_camera
    from gsplat_tpu.io import colmap
    from gsplat_tpu.render.render import render
    from scripts.selfcheck_train import gt_scene, rig, textured_scene

    make = textured_scene if ns.textured else gt_scene
    g_true, pts, colors = make(ns.n_gt)
    bg = jnp.zeros(3, jnp.float32)
    W = ns.width or ns.size
    H = ns.height or ns.size

    sparse = ns.out / "sparse" / "0"
    sparse.mkdir(parents=True, exist_ok=True)
    img_dir = ns.out / "images"
    img_dir.mkdir(parents=True, exist_ok=True)

    import math
    fovx = 0.9
    focal = 0.5 * W / math.tan(fovx / 2)
    fovy = 2 * math.atan(0.5 * H / focal)
    cams = {
        1: colmap.Camera(id=1, model="PINHOLE", width=W, height=H,
                         params=np.array([focal, focal, W / 2, H / 2]))
    }
    colmap.write_intrinsics_binary(cams, sparse / "cameras.bin")

    render_j = jax.jit(lambda c, gg: render(
        c, gg, bg, tile_size=16, chunk=128, pair_budget=ns.pair_budget).image)

    imgs = {}
    for i, (R, T) in enumerate(rig(ns.n_cams), start=1):
        cam = make_camera(R, T, fovx=fovx, fovy=fovy, width=W, height=H)
        img = np.asarray(render_j(cam, g_true))
        name = f"img_{i:03d}.png"
        PILImage.fromarray(
            (np.clip(img, 0, 1) * 255 + 0.5).astype(np.uint8)
        ).save(img_dir / name)
        imgs[i] = colmap.Image(
            id=i, qvec=colmap.rotmat2qvec(R.T), tvec=T, camera_id=1, name=name,
            xys=np.zeros((0, 2)), point3D_ids=np.zeros(0, np.int64),
        )
        print(f"rendered {i}/{ns.n_cams}", flush=True)
    colmap.write_extrinsics_binary(imgs, sparse / "images.bin")

    rng = np.random.default_rng(7)
    noisy = pts + rng.normal(size=pts.shape) * ns.noise
    rgb8 = (np.clip(colors, 0, 1) * 255).astype(np.uint8)
    colmap.write_points3D_binary(noisy, rgb8, np.zeros(len(pts)), sparse / "points3D.bin")
    print(f"wrote scene to {ns.out}", flush=True)


if __name__ == "__main__":
    main()
