"""Quality proxy: full upstream 30k-iteration schedule on a hard textured
synthetic scene at high resolution (VERDICT r1 item 10) — the closest
available stand-in for Mip-NeRF-360 'garden' parity while the container has
no datasets (zero egress). Records PSNR/SSIM + Gaussian-count trajectory.

    python scripts/quality_proxy.py /tmp/qproxy [--iters 30000]
        [--width 960 --height 540] [--n_cams 48] [--n_gt 60000]

Runs on whatever backend JAX selects (the real chip under axon).
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root", type=Path)
    ap.add_argument("--iters", type=int, default=30000)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=540)
    # 120 cams is the defensible default: the 48-cam variant is scene-limited
    # (19 dB train/test overfit gap from sparse view coverage); at 120 cams the
    # gap closes to ~1.7 dB and the number measures the trainer, not the scene.
    ap.add_argument("--n_cams", type=int, default=120)
    ap.add_argument("--n_gt", type=int, default=60000)
    ap.add_argument("--capacity", type=int, default=1 << 17)
    ap.add_argument("--pair_budget", type=int, default=1 << 21)
    ap.add_argument("--skip_make", action="store_true")
    ap.add_argument("--start_checkpoint", default="")
    ns = ap.parse_args()

    scene_dir = ns.root / "scene"
    out_dir = ns.root / "out"

    if not ns.skip_make:
        import scripts.make_synthetic_scene as mss

        sys.argv = [
            "make_synthetic_scene", str(scene_dir),
            "--n_cams", str(ns.n_cams),
            "--width", str(ns.width), "--height", str(ns.height),
            "--n_gt", str(ns.n_gt), "--textured",
            "--pair_budget", str(ns.pair_budget),
        ]
        mss.main()

    from gsplat_tpu.cli import main as cli_main

    sys.argv = [
        "gsplat-tpu",
        "--source_path", str(scene_dir), "--model_path", str(out_dir),
        "--eval", "--iterations", str(ns.iters),
        "--capacity", str(ns.capacity), "--pair_budget", str(ns.pair_budget),
        "--tile_size", "16",
        "--test_iterations", "1000", "7000", "15000", str(ns.iters),
        "--save_iterations", "7000", str(ns.iters),
        "--checkpoint_iterations", "7000", "15000", "22000", str(ns.iters),
    ]
    if ns.start_checkpoint:
        sys.argv += ["--start_checkpoint", ns.start_checkpoint]
    cli_main()

    # summarize the metrics stream
    lines = [json.loads(l) for l in open(out_dir / "metrics.jsonl")]
    evals = [l for l in lines if "test_psnr" in l]
    growth = [(l["step"], l["n_gaussians"]) for l in lines if "n_gaussians" in l]
    summary = {
        "config": {
            "iters": ns.iters, "resolution": f"{ns.width}x{ns.height}",
            "n_cams": ns.n_cams, "n_gt": ns.n_gt,
        },
        "test_psnr_by_iter": {str(l["step"]): l["test_psnr"] for l in evals},
        "final_test_psnr": evals[-1]["test_psnr"] if evals else None,
        "gaussian_count_trajectory": growth[:: max(len(growth) // 20, 1)],
    }
    (ns.root / "quality_proxy.json").write_text(json.dumps(summary, indent=1))
    print(json.dumps(summary["test_psnr_by_iter"]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
