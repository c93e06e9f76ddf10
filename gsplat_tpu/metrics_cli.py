"""Metrics CLI: PSNR / SSIM / L1 / LPIPS over rendered sets.

Equivalent of upstream 3DGS's `metrics.py` (absent in the reference — SURVEY.md §0).
LPIPS needs pretrained weights, which do not ship in a hermetic offline container;
pass the two standard files (torchvision vgg16 state_dict + lpips vgg.pth — the
same tensors upstream's `lpips` package uses) via --lpips_vgg/--lpips_lin and the
JAX LPIPS in gsplat_tpu.lpips fills the slot; otherwise it stays null.

    python -m gsplat_tpu.metrics_cli --model_paths <out> [<out2> ...] \
        [--lpips_vgg vgg16-397923af.pth --lpips_lin vgg.pth]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path
from typing import List, Optional

import numpy as np


def _load_dir(d: Path) -> List[np.ndarray]:
    from PIL import Image as PILImage

    out = []
    for p in sorted(d.iterdir()):
        with PILImage.open(p) as im:
            out.append(np.asarray(im, dtype=np.float32) / 255.0)
    return out


def evaluate_model(model_path: Path, lpips_params: Optional[dict] = None) -> dict:
    import jax.numpy as jnp

    from gsplat_tpu.train.loss import l1_loss, psnr, ssim

    lpips_fn = None
    if lpips_params is not None:
        import jax

        from gsplat_tpu.lpips import lpips as _lpips

        lpips_fn = jax.jit(lambda a, b: _lpips(lpips_params, a, b))

    results = {}
    for split in ("test", "train"):
        split_dir = model_path / split
        if not split_dir.exists():
            continue
        for method_dir in sorted(split_dir.iterdir()):
            renders_dir = method_dir / "renders"
            gt_dir = method_dir / "gt"
            if not renders_dir.exists() or not gt_dir.exists():
                continue
            renders = _load_dir(renders_dir)
            gts = _load_dir(gt_dir)
            ssims, psnrs, l1s, lps = [], [], [], []
            for r, gt in zip(renders, gts):
                r_j, gt_j = jnp.asarray(r), jnp.asarray(gt)
                ssims.append(float(ssim(r_j, gt_j)))
                psnrs.append(float(psnr(r_j, gt_j)))
                l1s.append(float(l1_loss(r_j, gt_j)))
                if lpips_fn is not None:
                    lps.append(float(lpips_fn(r_j, gt_j)))
            results[f"{split}/{method_dir.name}"] = {
                "SSIM": float(np.mean(ssims)) if ssims else None,
                "PSNR": float(np.mean(psnrs)) if psnrs else None,
                "L1": float(np.mean(l1s)) if l1s else None,
                # null unless the user supplied pretrained weights (see module doc)
                "LPIPS": float(np.mean(lps)) if lps else None,
                "n_images": len(renders),
            }
    return results


def main(argv: Optional[List[str]] = None) -> int:
    import argparse

    p = argparse.ArgumentParser(prog="gsplat-tpu-metrics")
    p.add_argument("--model_paths", "-m", nargs="+", required=True)
    p.add_argument("--lpips_vgg", default="",
                   help="torchvision vgg16 state_dict (.pth or .npz)")
    p.add_argument("--lpips_lin", default="",
                   help="lpips package vgg.pth linear heads (.pth or .npz)")
    ns = p.parse_args(argv)

    lpips_params = None
    if bool(ns.lpips_vgg) != bool(ns.lpips_lin):
        p.error("--lpips_vgg and --lpips_lin must be given together")
    if ns.lpips_vgg:
        from gsplat_tpu.lpips import load_lpips_weights

        lpips_params = load_lpips_weights(ns.lpips_vgg, ns.lpips_lin)

    for mp in ns.model_paths:
        mp = Path(mp)
        results = evaluate_model(mp, lpips_params)
        print(f"\nScene: {mp}")
        for method, vals in results.items():
            lp = f"  LPIPS {vals['LPIPS']:.4f}" if vals["LPIPS"] is not None else ""
            print(f"  {method}: PSNR {vals['PSNR']:.4f}  SSIM {vals['SSIM']:.4f}  "
                  f"L1 {vals['L1']:.5f}{lp}  ({vals['n_images']} images)")
        with open(mp / "results.json", "w") as f:
            json.dump(results, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
