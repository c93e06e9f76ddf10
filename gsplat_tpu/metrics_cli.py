"""Metrics CLI: PSNR / SSIM / L1 over rendered sets.

Equivalent of upstream 3DGS's `metrics.py` (absent in the reference — SURVEY.md §0).
LPIPS is intentionally omitted: it needs pretrained VGG/AlexNet weights, which are
not available in a hermetic offline environment; the JSON schema leaves the slot.

    python -m gsplat_tpu.metrics_cli --model_paths <out> [<out2> ...]
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


def evaluate_model(model_path: Path) -> dict:
    import jax.numpy as jnp

    from gsplat_tpu.train.loss import l1_loss, psnr, ssim

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
            ssims, psnrs, l1s = [], [], []
            for r, gt in zip(renders, gts):
                r_j, gt_j = jnp.asarray(r), jnp.asarray(gt)
                ssims.append(float(ssim(r_j, gt_j)))
                psnrs.append(float(psnr(r_j, gt_j)))
                l1s.append(float(l1_loss(r_j, gt_j)))
            results[f"{split}/{method_dir.name}"] = {
                "SSIM": float(np.mean(ssims)) if ssims else None,
                "PSNR": float(np.mean(psnrs)) if psnrs else None,
                "L1": float(np.mean(l1s)) if l1s else None,
                "LPIPS": None,  # needs pretrained weights; unavailable offline
                "n_images": len(renders),
            }
    return results


def main(argv: Optional[List[str]] = None) -> int:
    import argparse

    p = argparse.ArgumentParser(prog="gsplat-tpu-metrics")
    p.add_argument("--model_paths", "-m", nargs="+", required=True)
    ns = p.parse_args(argv)

    for mp in ns.model_paths:
        mp = Path(mp)
        results = evaluate_model(mp)
        print(f"\nScene: {mp}")
        for method, vals in results.items():
            print(f"  {method}: PSNR {vals['PSNR']:.4f}  SSIM {vals['SSIM']:.4f}  "
                  f"L1 {vals['L1']:.5f}  ({vals['n_images']} images)")
        with open(mp / "results.json", "w") as f:
            json.dump(results, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
