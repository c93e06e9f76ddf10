"""Configuration surface.

Mirrors the reference's four parameter groups — names, defaults, and CLI flags —
(`src/arguments/params.h:25-133`, `src/arguments/params.cpp:9-66` in the reference),
plus a TPU-specific ``MeshParams`` group (mesh axes, precision, static capacities) that
has no reference equivalent (the reference is single-device, SURVEY.md §2.2).
"""

from __future__ import annotations

import argparse
import dataclasses
import io
from dataclasses import dataclass, field
from typing import List, Optional, Tuple


@dataclass
class ModelParams:
    """Reference `ModelParams` (src/arguments/params.h:25-48)."""

    sh_degree: int = 3
    source_path: str = ""
    model_path: str = ""
    images: str = "images"
    resolution: int = -1
    white_background: bool = False
    data_device: str = "tpu"  # reference default "cuda"; here informational only
    eval: bool = False


@dataclass
class OptimizationParams:
    """Reference `OptimizationParams` (src/arguments/params.h:50-91) —
    upstream-3DGS hyperparameter names and defaults, verbatim."""

    iterations: int = 30_000
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold: float = 0.0002
    random_background: bool = False


@dataclass
class PipelineParams:
    """Reference `PipelineParams` (src/arguments/params.h:93-106).

    convert_SHs_python / compute_cov3D_python toggle WHERE upstream computes
    SH colors and 3D covariances (Python vs inside the CUDA rasterizer). In this
    framework both always happen in jnp/XLA ahead of the Pallas kernels, so the
    flags are accepted for CLI compatibility and are semantically no-ops;
    `debug` maps to NaN-checking (like --detect_anomaly)."""

    convert_SHs_python: bool = False
    compute_cov3D_python: bool = False
    debug: bool = False


@dataclass
class OtherParams:
    """Reference `OtherParams` (src/arguments/params.h:108-133)."""

    ip: str = "127.0.0.1"
    port: int = 6009
    debug_from: int = -1
    detect_anomaly: bool = False
    save_iterations: List[int] = field(default_factory=lambda: [7_000, 30_000])
    test_iterations: List[int] = field(default_factory=lambda: [7_000, 30_000])
    quiet: bool = False
    checkpoint_iterations: List[int] = field(default_factory=list)
    start_checkpoint: str = ""


@dataclass
class MeshParams:
    """TPU execution parameters — no reference equivalent (SURVEY.md §2.2).

    Static capacities exist because XLA requires static shapes: the Gaussian set
    lives in arrays of size ``capacity`` with a live count, and tile binning writes
    into a fixed ``pair_budget``-sized buffer (recompiled only on growth).
    """

    data_axis: int = 1           # camera-batch shards
    tile_axis: int = 1           # intra-image tile shards
    # multi-host bootstrap (jax.distributed over DCN): leave num_processes at 0
    # for single-process; on a pod slice launch one process per host with
    # matching coordinator_address/num_processes and a unique process_id
    coordinator_address: str = ""
    num_processes: int = 0
    process_id: int = -1
    profile_dir: str = ""        # capture a jax.profiler trace into this dir
    profile_steps: int = 10      # steps to trace (starting at iteration 20)
    tile_size: int = 32          # pixels per tile side (32x32: ~45% fewer pairs than 16)
    chunk_size: int = 128        # pairs per DMA block (multiple of 128 on TPU)
    capacity: int = 1 << 17      # initial Gaussian capacity (padded, static)
    pair_budget: int = 1 << 20   # max (Gaussian, tile) pairs per render (static)
    kept_frac: float = -1.0      # post-sort stage sizing. -1 (default) =
                                 # AUTO: the driver fits the kept-pair budget
                                 # from n_pairs/n_culled telemetry (exploiting
                                 # the tight tile cull; overflow regrows).
                                 # 1 = no split; fractions in (0,1) size it as
                                 # a fraction of pair_budget.
    sat_frac: float = -1.0       # saturation bound cull: pairs behind a
                                 # PROVABLE per-tile transmittance bound are
                                 # cut before the attribute gather / kernels /
                                 # backward (bit-identical image and
                                 # gradients). -1 (default) = AUTO: the driver
                                 # probes n_sat telemetry every 500 iters and
                                 # enables the cull once it would cut >= 2x
                                 # (density-proportional win; pure overhead on
                                 # sparse scenes). 0 = off; > 0 = on, sizing
                                 # the compacted survivor array as a fraction
                                 # of pair_budget (regrown adaptively).
    sat_probe_interval: int = 500  # iterations between auto-mode probes
    contrib_frac: float = -1.0   # backward d-array / gradient-reduction
                                 # sizing. -1 (default) = AUTO: fitted from
                                 # n_contrib telemetry (only pairs composited
                                 # before per-tile saturation carry gradient;
                                 # overflow steps zero grads and regrow).
                                 # 1 = worst-case; fractions in (0,1) size it
                                 # as a fraction of pair_budget.
    shard_gaussians: bool = False  # ZeRO-style layout: Gaussian params, Adam
                                 # moments and densify accumulators sharded over
                                 # the data axis (large-N memory scaling); the
                                 # infrequent densify/reset/checkpoint steps
                                 # gather->run->reshard (transiently replicated)
    precision: str = "f32"       # rasterizer accumulation precision


PARAM_GROUPS = (ModelParams, OptimizationParams, PipelineParams, OtherParams, MeshParams)

Params = Tuple[ModelParams, OptimizationParams, PipelineParams, OtherParams, MeshParams]


def build_arg_parser() -> argparse.ArgumentParser:
    """CLI mirroring the reference's boost::program_options registration
    (src/arguments/params.cpp:9-66): every field becomes ``--<name>``; bools are
    store_true flags; int lists are multitoken."""
    p = argparse.ArgumentParser(prog="gsplat-tpu", description=__doc__)
    # upstream short aliases (arguments/__init__.py in upstream 3DGS)
    shorts = {"source_path": "-s", "model_path": "-m", "resolution": "-r",
              "images": "-i", "white_background": "-w"}
    for group_cls in PARAM_GROUPS:
        grp = p.add_argument_group(group_cls.__name__)
        for f in dataclasses.fields(group_cls):
            name = f"--{f.name}"
            extra = [shorts[f.name]] if f.name in shorts else []
            default = f.default if f.default is not dataclasses.MISSING else f.default_factory()  # type: ignore[misc]
            if f.type in ("bool", bool):
                grp.add_argument(name, *extra, action="store_true", default=default)
            elif f.type in ("List[int]", List[int]):
                grp.add_argument(name, *extra, nargs="*", type=int, default=default)
            elif f.type in ("int", int):
                grp.add_argument(name, *extra, type=int, default=default)
            elif f.type in ("float", float):
                grp.add_argument(name, *extra, type=float, default=default)
            else:
                grp.add_argument(name, *extra, type=str, default=default)
    return p


def parse_parameters(argv: Optional[List[str]] = None) -> Params:
    """Reference `parse_parameters` (src/arguments/params.cpp:322-341)."""
    ns = build_arg_parser().parse_args(argv)
    out = []
    for group_cls in PARAM_GROUPS:
        kwargs = {f.name: getattr(ns, f.name) for f in dataclasses.fields(group_cls)}
        out.append(group_cls(**kwargs))
    return tuple(out)  # type: ignore[return-value]


def print_params(params, out=None) -> str:
    """Reference `print_params` (src/arguments/params.h:36-132): used for both console
    output and `cfg_args` persistence (src/utils/train_utils.cpp:69-74)."""
    buf = io.StringIO()
    title = {
        "ModelParams": "Model",
        "OptimizationParams": "Optimization",
        "PipelineParams": "Pipeline",
        "OtherParams": "Other",
        "MeshParams": "Mesh",
    }[type(params).__name__]
    buf.write(f"> {title} parameters:\n")
    for f in dataclasses.fields(params):
        v = getattr(params, f.name)
        if isinstance(v, bool):
            v = "true" if v else "false"
        elif isinstance(v, list):
            v = " ".join(str(x) for x in v) + " "
        buf.write(f"  {f.name}: {v}\n")
    s = buf.getvalue()
    if out is not None:
        out.write(s)
    return s


def cfg_args_string(model: ModelParams) -> str:
    """The `cfg_args` file content upstream viewers expect: a python-repr Namespace
    with the ModelParams fields (reference persists print_params instead,
    src/utils/train_utils.cpp:69-74; we write the upstream-compatible form)."""
    fields = dataclasses.asdict(model)
    inner = ", ".join(f"{k}={v!r}" for k, v in fields.items())
    return f"Namespace({inner})"
