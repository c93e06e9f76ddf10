"""Capture a jax.profiler trace of the fwd+bwd training step and print a per-op
time table (parses the xplane protobuf directly — the tensorboard-plugin-profile
converter is incompatible with the installed TF).

    python scripts/profile_step.py [--n 1000000] [--size 1920 1080]
"""

import argparse
import glob
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

import os

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


def print_xplane_summary(trace_dir: str, steps: int) -> None:
    import os

    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    paths = glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb")
    if not paths:
        print("no xplane.pb found", file=sys.stderr)
        return
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(sorted(paths)[-1], "rb").read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        md = plane.event_metadata
        tot, cnt = defaultdict(int), defaultdict(int)
        for line in plane.lines:
            for ev in line.events:
                name = md[ev.metadata_id].name if ev.metadata_id in md else "?"
                tot[name] += ev.duration_ps
                cnt[name] += 1
        print(f"== {plane.name} (top ops, ms/step over {steps} steps)")
        for name, ps in sorted(tot.items(), key=lambda kv: -kv[1])[:45]:
            if cnt[name] < steps:  # skip line aggregates
                continue
            print(f"  {ps / 1e9 / steps:9.3f} ms  x{cnt[name] // steps:4d}  {name[:100]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--size", type=int, nargs=2, default=[1920, 1080])
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--trace_dir", default="/tmp/gsplat_trace")
    ap.add_argument("--tile_size", type=int, default=32)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--ppg", type=float, default=4.0,
                    help="target pairs per Gaussian (bench scene density)")
    ap.add_argument("--pair_budget", type=int, default=5 << 19)
    ap.add_argument("--kept_budget", type=int, default=0,
                    help="post-sort stage size (0 = pair_budget, no split)")
    ap.add_argument("--contrib_budget", type=int, default=0,
                    help="backward d-array size (0 = never-overflows default)")
    ap.add_argument("--sat_budget", type=int, default=0,
                    help="saturation bound cull survivor budget (0 = off)")
    ap.add_argument("--compiler_option", action="append", default=[],
                    help="k=v XLA compiler option (repeatable); probed names "
                         "in scripts/probe_compiler_options.py")
    ns = ap.parse_args()

    from bench import build_scene
    from gsplat_tpu.render.render import render
    from gsplat_tpu.train.loss import photometric_loss

    w, h = ns.size
    g, cam = build_scene(ns.n, w, h, target_pairs_per_gaussian=ns.ppg,
                         tile_size=ns.tile_size)
    bg = jnp.zeros(3, jnp.float32)

    def f(g):
        def loss_fn(params):
            out = render(cam, g.with_params(params), bg, tile_size=ns.tile_size,
                         chunk=ns.chunk, pair_budget=ns.pair_budget,
                         kept_budget=ns.kept_budget or None,
                         contrib_budget=ns.contrib_budget or None,
                         sat_budget=ns.sat_budget or None)
            return photometric_loss(out.image, cam.image, 0.2), out.n_pairs
        (l, npair), grads = jax.value_and_grad(loss_fn, has_aux=True)(g.params())
        return l, npair, grads["xyz"]

    print("compiling...", file=sys.stderr)
    copts = dict(kv.split("=", 1) for kv in ns.compiler_option)
    c = jax.jit(f).lower(g).compile(compiler_options=copts or None)
    float(c(g)[0])  # host-fetch sync: block_until_ready returns early on the
    jax.profiler.start_trace(ns.trace_dir)  # axon-tunneled backend
    for _ in range(ns.steps):
        float(c(g)[0])
    jax.profiler.stop_trace()
    print_xplane_summary(ns.trace_dir, ns.steps)


if __name__ == "__main__":
    main()
