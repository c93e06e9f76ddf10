"""Full-evaluation orchestrator: train -> render sets -> metrics per scene.

Equivalent of upstream 3DGS's `full_eval.py` (absent in the reference, which
has no eval tooling at all — SURVEY.md §0): runs the standard workflow over a
list of scene directories and aggregates every scene's results.json into one
summary. Scene lists are explicit paths here (the container has no Mip-NeRF
360 / Tanks&Temples downloads); upstream flags --skip_training /
--skip_rendering / --skip_metrics and --output_path keep their meaning.

    python -m gsplat_tpu.full_eval -o ./eval360 \
        --scenes /data/garden /data/bicycle --iterations 30000
"""

from __future__ import annotations

import json
import sys
from pathlib import Path
from typing import List, Optional


def main(argv: Optional[List[str]] = None) -> int:
    import argparse

    p = argparse.ArgumentParser(prog="gsplat-tpu-full-eval")
    p.add_argument("--scenes", nargs="+", required=True,
                   help="COLMAP/Blender scene directories")
    p.add_argument("--output_path", "-o", default="./eval")
    p.add_argument("--skip_training", action="store_true")
    p.add_argument("--skip_rendering", action="store_true")
    p.add_argument("--skip_metrics", action="store_true")
    # unknown flags are forwarded to the trainer verbatim (upstream full_eval
    # forwards its extra args the same way)
    ns, train_args = p.parse_known_args(argv)
    ns.train_args = [a for a in train_args if a != "--"]

    out_root = Path(ns.output_path)
    out_root.mkdir(parents=True, exist_ok=True)

    model_paths = []
    for scene in ns.scenes:
        scene = Path(scene)
        model = out_root / scene.name
        model_paths.append(model)
        if not ns.skip_training:
            from gsplat_tpu.cli import main as train_main

            train_main([
                "--source_path", str(scene), "--model_path", str(model),
                "--eval", "--quiet", *ns.train_args,
            ])
        if not ns.skip_rendering:
            from gsplat_tpu.render_cli import main as render_main

            render_main([
                "--model_path", str(model), "--iteration", "-1",
                "--source_path", str(scene),
            ])

    if not ns.skip_metrics:
        from gsplat_tpu.metrics_cli import main as metrics_main

        metrics_main(["--model_paths", *map(str, model_paths)])

        summary = {}
        for model in model_paths:
            rj = model / "results.json"
            if rj.exists():
                summary[model.name] = json.loads(rj.read_text())
        (out_root / "full_eval.json").write_text(json.dumps(summary, indent=1))
        print(f"wrote {out_root / 'full_eval.json'} ({len(summary)} scenes)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
