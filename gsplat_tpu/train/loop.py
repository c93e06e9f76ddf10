"""Training driver: the complete train() the reference only sketches.

Reference: src/utils/train_utils.cpp:97-146 — prepare output dirs + cfg_args, build
model+scene, setup optimizers, then a loop that only updates the LR and bumps the SH
degree; the render/loss/backward/step/densify body is absent (SURVEY.md §2 'Train
driver'). This implements the full upstream 3DGS loop, TPU-first:

- ONE jitted train_step: render -> L1+D-SSIM loss -> grads (autodiff through the
  projection + the Pallas rasterizer's custom VJP) -> per-group Adam (LR schedule
  evaluated from the traced step, no host roundtrip) -> densification stats.
- densify/prune/reset-opacity are separate jitted ops invoked at the upstream
  intervals; capacity growth is the only host-side (recompiling) event.
- EMA loss logging, test-iteration PSNR eval, save/checkpoint iterations — the
  observability the reference's Printer/`cfg_args` scaffolding anticipates.
"""

from __future__ import annotations

import dataclasses
import functools
import random
import time
from pathlib import Path
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu.ckpt import (
    load_checkpoint,
    load_checkpoint_extras,
    save_checkpoint,
    save_ply,
)
from gsplat_tpu.config import (
    MeshParams,
    ModelParams,
    OptimizationParams,
    OtherParams,
    PipelineParams,
    cfg_args_string,
    print_params,
)
from gsplat_tpu.core.camera import Camera
from gsplat_tpu.core.gaussians import Gaussians, grow_capacity
from gsplat_tpu.render.render import render
from gsplat_tpu.scene import Scene
from gsplat_tpu.train.densify import (
    add_densification_stats,
    densify_and_prune_jit,
    reset_opacity_jit,
)
from gsplat_tpu.train.loss import photometric_loss, psnr
from gsplat_tpu.train.metrics import MetricsLogger
from gsplat_tpu.train.optim import (
    AdamState,
    adam_update,
    current_lrs,
    init_adam_state,
    make_lr_fns,
)


class Printer:
    """Timestamped logger (reference src/utils/train_utils.cpp:13-32, with the
    quiet logic un-inverted per SURVEY.md §2.1)."""

    def __init__(self, quiet: bool = False):
        self.quiet = quiet

    def print(self, msg: str) -> None:
        if not self.quiet:
            ts = time.strftime("%Y-%m-%d %H:%M:%S")
            print(f"[{ts}] {msg}", flush=True)


def initialize_random_seed(seed: int = 0) -> None:
    """Reference src/utils/train_utils.cpp:34-48 (srand + manual_seed 0)."""
    random.seed(seed)
    np.random.seed(seed)


def prepare_output_and_logger(model: ModelParams, all_params) -> Path:
    """Output dir + cfg_args persistence (reference train_utils.cpp:52-93)."""
    path = model.model_path
    if not path:
        path = time.strftime("./output/%Y-%m-%dT%H-%M-%S")
        model.model_path = path
    out = Path(path)
    out.mkdir(parents=True, exist_ok=True)
    (out / "cfg_args").write_text(cfg_args_string(model))
    with open(out / "params.txt", "w") as f:
        for p in all_params:
            print_params(p, out=f)
    return out


def _kept_budget(mesh: MeshParams, budget: int) -> Optional[int]:
    """kept_frac in (0, 1) sizes the post-sort render stages by the tile-cull
    survivor count (see render.render_projected); None means no split.
    kept_frac < 0 (AUTO, the default) also starts at None: the driver then
    fits the budget from n_pairs/n_culled telemetry (see the adaptive-budget
    block in train())."""
    if mesh.kept_frac >= 1.0 or mesh.kept_frac < 0:
        return None
    return max(int(budget * mesh.kept_frac), mesh.chunk_size)


def _sat_budget0(mesh: MeshParams, budget: int) -> Optional[int]:
    """sat_frac > 0 enables the saturation bound cull; the compacted survivor
    array starts at this size and regrows from n_sat telemetry. sat_frac < 0
    (AUTO, the default) also returns None: the driver starts with the cull off
    and enables it from probe telemetry (see _sat_probe)."""
    if mesh.sat_frac <= 0.0:
        return None
    return max(int(budget * mesh.sat_frac), mesh.chunk_size)


@functools.partial(jax.jit, static_argnames=("tile_size", "chunk", "pair_budget"))
def _sat_probe(g, cam, bg, *, tile_size, chunk, pair_budget):
    """One render with a can't-overflow sat budget, for its telemetry only:
    n_sat = chunk-aligned slots the saturation bound cull keeps (the bench's
    auto-fit does the same probe, bench.py sat_probe)."""
    out = render(cam, g, bg, tile_size=tile_size, chunk=chunk,
                 pair_budget=pair_budget, sat_budget=pair_budget)
    return out.n_sat, out.n_pairs, out.n_culled, out.n_dropped


def _contrib_budget0(mesh: MeshParams, budget: int) -> Optional[int]:
    """contrib_frac in (0, 1) sizes the backward d-array + gradient reduction
    by the saturation-compacted pair count (see render.render_projected);
    None means the never-overflows worst case. contrib_frac < 0 (AUTO, the
    default) also starts at None and fits from n_contrib telemetry."""
    if mesh.contrib_frac >= 1.0 or mesh.contrib_frac < 0:
        return None
    return max(int(budget * mesh.contrib_frac), 512)


def make_train_step(
    opt: OptimizationParams,
    mesh: MeshParams,
    spatial_lr_scale: float,
    width: int,
    height: int,
    pair_budget: Optional[int] = None,
    contrib_budget: Optional[int] = None,
    sat_budget: Optional[int] = None,
    kept_budget: Optional[int] = None,
) -> Callable:
    """Build the jitted train step for a fixed camera resolution. The Gaussians
    pytree's static fields (capacity via shapes, active_sh_degree) participate in
    the jit cache key automatically; pair_budget overrides mesh.pair_budget (the
    driver resizes it adaptively), contrib_budget/kept_budget likewise for the
    backward compaction and post-sort budgets."""
    lr_fns = make_lr_fns(opt, spatial_lr_scale)
    budget = pair_budget if pair_budget is not None else mesh.pair_budget
    kept = kept_budget if kept_budget is not None else _kept_budget(mesh, budget)
    if contrib_budget is None:
        contrib_budget = _contrib_budget0(mesh, budget)
    if sat_budget is None:
        sat_budget = _sat_budget0(mesh, budget)

    @jax.jit
    def train_step(
        g: Gaussians,
        opt_state: AdamState,
        cam: Camera,
        bg: jnp.ndarray,
        step: jnp.ndarray,
        ema: jnp.ndarray,
    ):
        params = g.params()
        zeros2d = jnp.zeros((g.capacity, 2), jnp.float32)

        def loss_fn(p, mean2d_offset):
            g2 = g.with_params(p)
            out = render(
                cam, g2, bg,
                tile_size=mesh.tile_size,
                chunk=mesh.chunk_size,
                pair_budget=budget,
                kept_budget=kept,
                contrib_budget=contrib_budget,
                sat_budget=sat_budget,
                mean2d_offset=mean2d_offset,
            )
            loss = photometric_loss(out.image, cam.image, opt.lambda_dssim)
            return loss, out

        (loss, out), (pgrads, mean2d_grad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, zeros2d)

        lrs = current_lrs(lr_fns, step)
        new_params, new_opt_state = adam_update(params, pgrads, opt_state, lrs)
        g_new = g.with_params(new_params)
        g_new = add_densification_stats(g_new, mean2d_grad, out.radii, width, height)
        # EMA on device: the driver must not force a host sync every iteration
        new_ema = jnp.where(step <= 1, loss, 0.4 * loss + 0.6 * ema)
        return (g_new, new_opt_state, loss, new_ema,
                out.n_pairs, out.n_dropped, out.n_culled, out.n_contrib,
                out.n_sat)

    return train_step


@functools.partial(jax.jit, static_argnames=("tile_size", "chunk", "pair_budget"))
def _gui_render(g, cam, bg, scaling_modifier, *, tile_size, chunk, pair_budget):
    """Jitted network-GUI view render: eager dispatch of the whole pipeline on
    a tunneled TPU costs seconds per viewer frame (per-op roundtrips), a
    compiled call milliseconds. The jit cache keys on the camera's static
    (width, height) via the Camera pytree plus the static budget knobs."""
    return render(cam, g, bg, tile_size=tile_size, chunk=chunk,
                  pair_budget=pair_budget,
                  scaling_modifier=scaling_modifier).image


@functools.partial(jax.jit, static_argnames=("tile_size", "chunk", "pair_budget"))
def eval_render(g, cam, bg, *, tile_size, chunk, pair_budget):
    return render(cam, g, bg, tile_size=tile_size, chunk=chunk,
                  pair_budget=pair_budget).image


@functools.partial(jax.jit, static_argnames=("lambda_dssim", "tile_size", "chunk", "pair_budget"))
def eval_step(g, cam, bg, *, lambda_dssim, tile_size, chunk, pair_budget):
    out = render(cam, g, bg, tile_size=tile_size, chunk=chunk, pair_budget=pair_budget)
    return (
        photometric_loss(out.image, cam.image, lambda_dssim),
        psnr(out.image, cam.image),
        out.n_dropped,
    )


def train(
    model: ModelParams,
    opt: OptimizationParams,
    pipe: PipelineParams,
    other: OtherParams,
    mesh: MeshParams,
    *,
    progress_every: int = 100,
) -> Tuple[Gaussians, Scene]:
    """The full training entry point (reference train_utils.cpp:97-146, completed)."""
    # multi-host: every process runs the same loop (same seeds -> same camera
    # picks); host-side IO (logging, metrics, saves, viewer) is process-0-only
    is_main = jax.process_index() == 0
    printer = Printer(other.quiet or not is_main)
    if is_main:
        out_dir = prepare_output_and_logger(model, (model, opt, pipe, other, mesh))
    else:
        out_dir = Path(model.model_path or ".")
    printer.print(f"Output folder: {out_dir}")

    scene = Scene(model, capacity=mesh.capacity)
    g = scene.gaussians
    printer.print(
        f"Loaded scene: {len(scene.get_train_cameras())} train / "
        f"{len(scene.get_test_cameras())} test cameras, "
        f"{int(g.n_live)} initial Gaussians (capacity {g.capacity}), "
        f"extent {scene.cameras_extent:.3f}"
    )

    opt_state = init_adam_state(g.params())
    first_iter = 0
    resume_extras: dict = {}
    if other.start_checkpoint:
        g, opt_state, first_iter = load_checkpoint(other.start_checkpoint, mesh.capacity)
        resume_extras = load_checkpoint_extras(other.start_checkpoint)
        printer.print(f"Restored checkpoint {other.start_checkpoint} at iter {first_iter}")

    bg = jnp.asarray(
        [1.0, 1.0, 1.0] if model.white_background else [0.0, 0.0, 0.0], jnp.float32
    )

    train_cams = scene.get_train_cameras()
    w, h = train_cams[0].width, train_cams[0].height
    pair_budget = mesh.pair_budget
    if "pair_budget" in resume_extras:  # resume with the grown budget, no re-ramp
        pair_budget = max(pair_budget, int(resume_extras["pair_budget"]))
    if mesh.data_axis == -1:  # auto: consume every device (make_mesh contract)
        assert len(jax.devices()) % mesh.tile_axis == 0, (
            len(jax.devices()), mesh.tile_axis)
        mesh = dataclasses.replace(
            mesh, data_axis=len(jax.devices()) // mesh.tile_axis
        )
    n_mesh_dev = mesh.data_axis * mesh.tile_axis
    spmd = n_mesh_dev > 1
    sharded = spmd and mesh.shard_gaussians
    if mesh.shard_gaussians and not spmd:
        printer.print("--shard_gaussians ignored on a 1-device mesh")
    multihost = False
    if spmd:
        from gsplat_tpu.dist.data import replicate_gaussians, shard_gaussians
        from gsplat_tpu.dist.mesh import make_mesh
        from gsplat_tpu.dist.spmd import (
            make_sharded_spmd_train_step, make_spmd_train_step, stack_cameras,
        )

        if n_mesh_dev > len(jax.devices()):
            raise ValueError(
                f"mesh {mesh.data_axis}x{mesh.tile_axis} needs {n_mesh_dev} devices, "
                f"have {len(jax.devices())}"
            )
        dev_mesh = make_mesh(data=mesh.data_axis, tile=mesh.tile_axis)
        printer.print(
            f"SPMD: {mesh.data_axis}-camera batches x {mesh.tile_axis} tile bands"
            + (" (ZeRO-sharded Gaussians)" if sharded else "")
            + (f" over {jax.process_count()} processes"
               if jax.process_count() > 1 else "")
        )
        multihost = jax.process_count() > 1
        if multihost:
            from gsplat_tpu.dist.data import global_camera_batch
            from gsplat_tpu.dist.mesh import local_data_rows

            my_rows = local_data_rows(dev_mesh)
        if sharded and g.capacity % mesh.data_axis != 0:
            raise ValueError(
                f"--shard_gaussians needs capacity % data_axis == 0 "
                f"(got {g.capacity} % {mesh.data_axis})"
            )
        # place the model across the global mesh up-front so the first step
        # compiles once with steady-state shardings
        if sharded:
            g, opt_state = shard_gaussians(dev_mesh, g, opt_state)
        elif multihost:
            g = replicate_gaussians(dev_mesh, g)
            opt_state = replicate_gaussians(dev_mesh, opt_state)

    # sharded mode: the per-step path keeps every (CAP, ...) leaf sharded over
    # `data`; the INFREQUENT whole-model operations (densify/prune every 100
    # iters, opacity reset every 3000, checkpoint/PLY saves, eval) gather to
    # replicated, run the exact same jitted code as the replicated path
    # (bit-identical results), then reshard. The transient gather needs full-
    # model HBM on each device — fine up to the documented 2^24-Gaussian id
    # ceiling; past it these ops would need the per-shard densify redesign.
    def to_host_view(g_, opt_state_=None):
        if not sharded:
            return g_ if opt_state_ is None else (g_, opt_state_)
        if opt_state_ is None:
            return replicate_gaussians(dev_mesh, g_)
        return (replicate_gaussians(dev_mesh, g_),
                replicate_gaussians(dev_mesh, opt_state_))

    def to_step_view(g_, opt_state_):
        if not sharded:
            return g_, opt_state_
        return shard_gaussians(dev_mesh, g_, opt_state_)

    # AUTO budgets (kept_frac / contrib_frac / sat_frac = -1, the defaults):
    # start unsplit / worst-case and fit from telemetry — the bench's probe-
    # and-fit passes, done continuously by the driver. Manual fractions and
    # explicit 0/1 keep the round-3 semantics.
    kept_auto = mesh.kept_frac < 0.0
    kept_budget = _kept_budget(mesh, pair_budget)  # None in auto/off modes
    if "kept_budget" in resume_extras:
        if kept_budget is not None:
            kept_budget = max(kept_budget, int(resume_extras["kept_budget"]))
        elif kept_auto:
            kept_budget = int(resume_extras["kept_budget"])
    contrib_auto = mesh.contrib_frac < 0.0
    contrib_budget = _contrib_budget0(mesh, pair_budget)
    if "contrib_budget" in resume_extras:
        if contrib_budget is not None:
            contrib_budget = max(contrib_budget,
                                 int(resume_extras["contrib_budget"]))
        elif contrib_auto:
            contrib_budget = int(resume_extras["contrib_budget"])
    sat_auto = mesh.sat_frac < 0.0
    sat_budget = _sat_budget0(mesh, pair_budget)
    if "sat_budget" in resume_extras:
        if sat_budget is not None:
            sat_budget = max(sat_budget, int(resume_extras["sat_budget"]))
        elif sat_auto:  # auto mode had enabled the cull before the checkpoint
            sat_budget = int(resume_extras["sat_budget"])

    def build_step(budget, contrib, sat, kept):
        if sharded:
            return make_sharded_spmd_train_step(
                dev_mesh, opt, mesh, g.spatial_lr_scale, w, h,
                pair_budget=budget, contrib_budget=contrib, sat_budget=sat,
                kept_budget=kept,
            )
        if spmd:
            return make_spmd_train_step(
                dev_mesh, opt, mesh, g.spatial_lr_scale, w, h,
                pair_budget=budget, contrib_budget=contrib, sat_budget=sat,
                kept_budget=kept,
            )
        return make_train_step(opt, mesh, g.spatial_lr_scale, w, h,
                               pair_budget=budget, contrib_budget=contrib,
                               sat_budget=sat, kept_budget=kept)

    train_step = build_step(pair_budget, contrib_budget, sat_budget,
                            kept_budget)
    low_usage_streak = 0
    low_contrib_streak = 0
    low_sat_streak = 0
    low_kept_streak = 0

    metrics = MetricsLogger(model.model_path if is_main else None)

    # live viewer + SIBR-protocol network GUI on the reference's ip/port flags
    # (parsed-but-unused there; src/arguments/params.h:110-111) — best-effort,
    # silent on port conflicts. One port: HTTP requests get the browser
    # preview, anything else speaks upstream's network_gui wire format.
    viewer = None
    # multi-host: every preview/GUI render would be a single-process dispatch
    # of arrays replicated over the GLOBAL mesh (non-addressable from process
    # 0 alone) — invalid in JAX. The viewer is single-/multi-device
    # single-process only.
    if not other.quiet and is_main and jax.process_count() == 1:
        from gsplat_tpu.network_gui import NetworkGUIServer

        viewer = NetworkGUIServer(
            Path(out_dir), other.ip, other.port, verify=model.source_path
        )
        if viewer.url:
            printer.print(f"viewer: {viewer.url}")
    rng = jax.random.PRNGKey(0)
    cam_order: List[int] = []
    ema_loss = jnp.zeros((), jnp.float32)
    # bit-exact resume: restore every loop-level RNG/cursor the step sequence
    # depends on (VERDICT r1 item 7) — the JAX key, the python `random` state
    # driving camera shuffles, the un-consumed camera order, EMA, streak
    if resume_extras:
        import pickle

        if "rng_key" in resume_extras:
            rng = jnp.asarray(resume_extras["rng_key"])
        if "cam_order" in resume_extras:
            cam_order = [int(i) for i in resume_extras["cam_order"]]
        if "ema_loss" in resume_extras:
            ema_loss = jnp.asarray(resume_extras["ema_loss"], jnp.float32)
        if "low_usage_streak" in resume_extras:
            low_usage_streak = int(resume_extras["low_usage_streak"])
        if "py_random" in resume_extras:
            random.setstate(pickle.loads(resume_extras["py_random"].tobytes()))

    def loop_extras() -> dict:
        import pickle

        return {
            "rng_key": np.asarray(rng),
            "ema_loss": np.asarray(ema_loss, np.float32),
            "pair_budget": np.asarray(pair_budget, np.int64),
            **({"contrib_budget": np.asarray(contrib_budget, np.int64)}
               if contrib_budget is not None else {}),
            **({"kept_budget": np.asarray(kept_budget, np.int64)}
               if kept_budget is not None else {}),
            **({"sat_budget": np.asarray(sat_budget, np.int64)}
               if sat_budget is not None else {}),
            "cam_order": np.asarray(cam_order, np.int64),
            "low_usage_streak": np.asarray(low_usage_streak, np.int64),
            "py_random": np.frombuffer(
                pickle.dumps(random.getstate()), np.uint8
            ).copy(),
        }

    def _serve_gui_request(req, g, bg, mesh, pair_budget):
        """Render one network-GUI custom view and unblock its connection."""
        from gsplat_tpu.network_gui import camera_from_request, image_to_bytes

        img_bytes = None
        try:
            if req.world_view is not None:
                cam = camera_from_request(req)
                img = _gui_render(
                    g, cam, bg, jnp.float32(req.scaling_modifier),
                    tile_size=mesh.tile_size, chunk=mesh.chunk_size,
                    pair_budget=pair_budget,
                )
                img_bytes = image_to_bytes(img)
        except Exception:
            pass  # GUI is best-effort; never kill training for a bad request
        req.reply(img_bytes)

    t0 = time.time()
    iteration = first_iter

    try:
        for iteration in range(first_iter + 1, opt.iterations + 1):
            # network-GUI round-trips at loop top (upstream train.py order):
            # render any custom viewer cameras; if the viewer paused training
            # (train=False, keep_alive), keep serving until it resumes or
            # disconnects.
            if viewer is not None and viewer.url:
                while True:
                    req = viewer.poll()
                    if req is None:
                        if viewer.training_paused and viewer.sibr_connected:
                            time.sleep(0.02)
                            continue
                        viewer.training_paused = False
                        break
                    _serve_gui_request(req, to_host_view(g), bg, mesh,
                                       pair_budget)
                    viewer.training_paused = (not req.do_training
                                              and req.keep_alive)

            # SH degree annealing every 1000 iters (reference gaussian_model.cpp:307-313)
            if iteration % 1000 == 0:
                g = g.oneup_sh_degree()

            n_pick = mesh.data_axis if spmd else 1
            picks = []
            for _ in range(n_pick):
                if not cam_order:
                    cam_order = list(range(len(train_cams)))
                    random.shuffle(cam_order)
                picks.append(train_cams[cam_order.pop()])
            cam = picks[0]

            if opt.random_background:
                rng, sub = jax.random.split(rng)
                step_bg = jax.random.uniform(sub, (3,), jnp.float32)
            else:
                step_bg = bg

            # --profile_dir: capture a jax.profiler trace of steady-state steps
            # (reference acknowledges and skips timing, train_utils.cpp:119-121)
            if mesh.profile_dir and iteration == 20:
                jax.profiler.start_trace(mesh.profile_dir)
            if mesh.profile_dir and iteration == 20 + mesh.profile_steps:
                jax.block_until_ready(g.xyz)
                jax.profiler.stop_trace()
                printer.print(f"profiler trace written to {mesh.profile_dir}")

            if spmd and multihost:
                # every process computed the same global `picks` (shared RNG);
                # each contributes only the data-axis rows its devices own
                step_input = global_camera_batch(
                    dev_mesh, [picks[d] for d in my_rows]
                )
            elif spmd:
                from gsplat_tpu.dist.spmd import stack_cameras

                step_input = stack_cameras(picks)
            else:
                step_input = cam
            (g, opt_state, loss, ema_loss, n_pairs, n_dropped, n_culled,
             n_contrib, n_sat) = train_step(
                g, opt_state, step_input, step_bg,
                jnp.asarray(iteration, jnp.int32), ema_loss,
            )

            # --- adaptive pair budget (both drivers): every gather/sort in the
            # render pipeline scales with the STATIC budget. Checked every 10
            # iters only — scalar readbacks are host syncs; a short lag of
            # dropped-pair steps is harmless ---
            if iteration % 10 != 0:
                pass
            elif sat_budget is not None and int(n_sat) > sat_budget:
                # sat overflow zeroed this step's gradients (and truncated the
                # image); regrow first — its excess also lands in n_dropped,
                # so a premature pair-budget doubling must not fire on it
                sat_budget = max(sat_budget * 2,
                                 -(-int(n_sat) // mesh.chunk_size)
                                 * mesh.chunk_size)
                printer.print(
                    f"[iter {iteration}] sat budget -> {sat_budget} "
                    f"({int(n_sat)} survivor slots; recompiling)"
                )
                train_step = build_step(pair_budget, contrib_budget, sat_budget,
                                        kept_budget)
                low_sat_streak = 0
            elif (kept_budget is not None and int(n_dropped) > 0
                  and int(n_pairs) < pair_budget):
                # n_pairs < pair_budget means the expansion fit — the drop is
                # a KEPT-budget overflow (grad_ok zeroed this step); regrow to
                # the observed demand (kept + dropped) with 20% headroom
                kept_budget = min(pair_budget, max(
                    kept_budget * 2,
                    -(-int((kept_budget + int(n_dropped)) * 1.2)
                      // mesh.chunk_size) * mesh.chunk_size,
                ))
                printer.print(
                    f"[iter {iteration}] kept budget -> {kept_budget} "
                    f"({int(n_dropped)} kept pairs dropped; recompiling)"
                )
                train_step = build_step(pair_budget, contrib_budget,
                                        sat_budget, kept_budget)
                low_kept_streak = 0
            elif int(n_dropped) > 0:
                pair_budget *= 2
                if contrib_budget is not None:
                    contrib_budget *= 2
                printer.print(
                    f"[iter {iteration}] pair budget {pair_budget // 2} -> {pair_budget} "
                    f"({int(n_dropped)} pairs dropped; recompiling)"
                )
                train_step = build_step(pair_budget, contrib_budget, sat_budget,
                                        kept_budget)
                low_usage_streak = 0
            elif contrib_budget is not None and int(n_contrib) > contrib_budget:
                # contrib overflow zeroed this step's gradients (the image is
                # still exact); regrow the compaction budget
                contrib_budget = max(contrib_budget * 2,
                                     -(-int(n_contrib) // 512) * 512)
                printer.print(
                    f"[iter {iteration}] contrib budget -> {contrib_budget} "
                    f"({int(n_contrib)} compacted rows; recompiling)"
                )
                train_step = build_step(pair_budget, contrib_budget, sat_budget,
                                        kept_budget)
                low_contrib_streak = 0
            elif int(n_pairs) * 4 < pair_budget and pair_budget > mesh.pair_budget:
                low_usage_streak += 1
                if low_usage_streak >= 20:  # 20 checks x 10 iters = 200 iterations
                    pair_budget //= 2
                    printer.print(
                        f"[iter {iteration}] pair budget shrink -> {pair_budget}"
                    )
                    train_step = build_step(pair_budget, contrib_budget, sat_budget,
                                        kept_budget)
                    low_usage_streak = 0
            else:
                low_usage_streak = 0
                if (contrib_budget is not None
                        and int(n_contrib) * 4 < contrib_budget
                        and contrib_budget
                        > (_contrib_budget0(mesh, pair_budget) or 512)):
                    low_contrib_streak += 1
                    if low_contrib_streak >= 20:
                        contrib_budget //= 2
                        printer.print(
                            f"[iter {iteration}] contrib budget shrink -> "
                            f"{contrib_budget}"
                        )
                        train_step = build_step(pair_budget, contrib_budget,
                                                sat_budget, kept_budget)
                        low_contrib_streak = 0
                elif (contrib_auto and contrib_budget is None
                        and int(n_contrib) * 2 < (kept_budget or pair_budget)):
                    # AUTO contrib (contrib_frac=-1): bootstrap the backward-
                    # compaction split once the composited-pair count is
                    # provably far below the worst-case d-array
                    low_contrib_streak += 1
                    if low_contrib_streak >= 20:
                        contrib_budget = max(
                            -(-int(int(n_contrib) * 1.5) // 512) * 512, 512)
                        printer.print(
                            f"[iter {iteration}] contrib budget fit -> "
                            f"{contrib_budget} ({int(n_contrib)} composited "
                            f"rows; recompiling)"
                        )
                        train_step = build_step(pair_budget, contrib_budget,
                                                sat_budget, kept_budget)
                        low_contrib_streak = 0
                else:
                    low_contrib_streak = 0
                if (sat_budget is not None
                        and int(n_sat) * 4 < sat_budget
                        and sat_budget
                        > (_sat_budget0(mesh, pair_budget) or mesh.chunk_size)):
                    low_sat_streak += 1
                    if low_sat_streak >= 20:
                        sat_budget //= 2
                        printer.print(
                            f"[iter {iteration}] sat budget shrink -> "
                            f"{sat_budget}"
                        )
                        train_step = build_step(pair_budget, contrib_budget,
                                                sat_budget, kept_budget)
                        low_sat_streak = 0
                else:
                    low_sat_streak = 0
                # AUTO kept budget (kept_frac=-1): bootstrap/refit the
                # post-sort split from the kept-pair telemetry. fitted uses
                # n_pairs - n_culled (exact single-device; in SPMD n_culled
                # is a sum over shards, so fitted under-estimates — the 1.5x
                # margin plus the overflow regrow above absorb that)
                fitted_kept = max(int(n_pairs) - int(n_culled), 0)
                kept_target = -(-int(fitted_kept * 1.5 + mesh.chunk_size)
                                // mesh.chunk_size) * mesh.chunk_size
                if (kept_auto and kept_target * 2
                        < (kept_budget or pair_budget)):
                    low_kept_streak += 1
                    if low_kept_streak >= 20:
                        kept_budget = max(kept_target, mesh.chunk_size)
                        printer.print(
                            f"[iter {iteration}] kept budget fit -> "
                            f"{kept_budget} (kept {fitted_kept} of "
                            f"{int(n_pairs)} pairs; recompiling)"
                        )
                        train_step = build_step(pair_budget, contrib_budget,
                                                sat_budget, kept_budget)
                        low_kept_streak = 0
                else:
                    low_kept_streak = 0

            # --- AUTO saturation cull (default, sat_frac=-1): probe n_sat
            # telemetry every 500 iters while off; enable once the cull would
            # provably cut the post-sort pair stages >= 2x. The cull is
            # bit-identical by construction, so enabling it mid-run changes
            # nothing but step time; its budget then regrows/shrinks through
            # the same adaptive machinery as the manual flag. Guards: the sat
            # key packing needs gid < 2^24 and an exact int32 quanta cumsum
            # (kept < 2^25). ---
            if (sat_auto and sat_budget is None
                    and iteration % mesh.sat_probe_interval == 0
                    and pair_budget < (1 << 25) and g.capacity < (1 << 24)):
                ns_p, np_p, nc_p, nd_p = _sat_probe(
                    to_host_view(g), cam, bg, tile_size=mesh.tile_size,
                    chunk=mesh.chunk_size, pair_budget=pair_budget,
                )
                kept_live = int(np_p) - int(nc_p)
                if int(nd_p) == 0 and 2 * int(ns_p) < kept_live:
                    sat_budget = (-(-int(ns_p) // mesh.chunk_size)
                                  * mesh.chunk_size + mesh.chunk_size)
                    printer.print(
                        f"[iter {iteration}] saturation cull AUTO-ENABLED: "
                        f"{int(ns_p)} survivor slots of {kept_live} kept pairs "
                        f"(sat budget {sat_budget}; recompiling)"
                    )
                    train_step = build_step(pair_budget, contrib_budget,
                                            sat_budget, kept_budget)
                    low_sat_streak = 0

            # --- logging / eval / save / checkpoint FIRST (upstream order:
            # training_report runs before densify/reset within an iteration, so
            # an eval or save landing on an opacity-reset iteration sees the
            # pre-reset model) ---
            if iteration % progress_every == 0:
                rate = progress_every / max(time.time() - t0, 1e-9)
                t0 = time.time()
                if viewer is not None and viewer.url:
                    pv = eval_render(
                        to_host_view(g), train_cams[0], bg,
                        tile_size=mesh.tile_size, chunk=mesh.chunk_size,
                        pair_budget=pair_budget,
                    )
                    viewer.publish(np.asarray(pv))
                printer.print(
                    f"iter {iteration}/{opt.iterations} loss {float(loss):.5f} "
                    f"ema {float(ema_loss):.5f} gaussians {int(g.n_live)} "
                    f"({rate:.1f} it/s)"
                )
                metrics.log(
                    iteration, loss=float(loss), ema_loss=float(ema_loss),
                    n_gaussians=int(g.n_live), capacity=g.capacity,
                    it_per_s=round(rate, 2), n_dropped_pairs=int(n_dropped),
                    n_culled_pairs=int(n_culled),
                    n_contrib_pairs=int(n_contrib),
                    n_sat_pairs=int(n_sat),
                )

            if iteration in other.test_iterations:
                evaluate(scene, to_host_view(g), bg, opt, mesh, printer,
                         iteration, metrics, pair_budget=pair_budget)

            if iteration in other.save_iterations:
                # the sharded gather is a COLLECTIVE — every process must run
                # it in lockstep; only process 0 then writes the file
                g_save = to_host_view(g)
                if is_main:
                    printer.print(f"[iter {iteration}] saving point cloud")
                    save_ply(
                        Path(out_dir) / "point_cloud" / f"iteration_{iteration}" / "point_cloud.ply",
                        g_save,
                    )

            # --- densification (upstream schedule; reference params.h:50-91) ---
            if iteration < opt.densify_until_iter:
                if (
                    iteration > opt.densify_from_iter
                    and iteration % opt.densification_interval == 0
                ):
                    max_screen = 20.0 if iteration > opt.opacity_reset_interval else 0.0
                    rng, sub = jax.random.split(rng)
                    if sharded:  # gather -> identical replicated densify -> reshard
                        g, opt_state = to_host_view(g, opt_state)
                    g, opt_state, dropped = densify_and_prune_jit(
                        g, opt_state, sub,
                        max_grad=jnp.float32(opt.densify_grad_threshold),
                        min_opacity=jnp.float32(0.005),
                        extent=jnp.float32(scene.cameras_extent),
                        max_screen_size=jnp.float32(max_screen),
                        percent_dense=jnp.float32(opt.percent_dense),
                    )
                    dropped = int(dropped)
                    n_live = int(g.n_live)
                    if dropped > 0 or n_live > 0.9 * g.capacity:
                        new_cap = g.capacity * 2
                        printer.print(
                            f"[iter {iteration}] growing capacity {g.capacity} -> {new_cap} "
                            f"(live {n_live}, dropped {dropped})"
                        )
                        g = grow_capacity(g, new_cap)
                        opt_state = _grow_opt_state(opt_state, new_cap)
                    if sharded:
                        g, opt_state = to_step_view(g, opt_state)

                if iteration % opt.opacity_reset_interval == 0 or (
                    model.white_background and iteration == opt.densify_from_iter
                ):
                    if sharded:
                        g, opt_state = to_host_view(g, opt_state)
                    g, opt_state = reset_opacity_jit(g, opt_state)
                    if sharded:
                        g, opt_state = to_step_view(g, opt_state)

            # checkpoint LAST within the iteration (upstream train.py order:
            # after densify + optimizer step) so resume at iteration+1 is exact
            if iteration in other.checkpoint_iterations:
                # gather on ALL processes (collective), write on process 0
                g_ck, opt_ck = to_host_view(g, opt_state)
                if is_main:
                    printer.print(f"[iter {iteration}] saving checkpoint")
                    save_checkpoint(
                        Path(out_dir) / f"chkpnt{iteration}.npz", g_ck, opt_ck,
                        iteration, extra=loop_extras(),
                    )

    except KeyboardInterrupt:
        # interrupt recovery (SURVEY.md §5 'Failure detection' row): persist an
        # emergency checkpoint so --start_checkpoint can resume exactly here
        path = Path(out_dir) / f"chkpnt_interrupt_{iteration}.npz"
        printer.print(f"interrupted at iter {iteration}; saving {path}")
        g_ck, opt_ck = to_host_view(g, opt_state)
        save_checkpoint(path, g_ck, opt_ck, iteration, extra=loop_extras())
        raise
    finally:
        metrics.close()
        if viewer is not None:
            viewer.close()
    return g, scene


def evaluate(scene, g, bg, opt, mesh, printer, iteration, metrics=None,
             pair_budget=None) -> None:
    """Test/train-sample PSNR report (upstream training_report). Uses the
    driver's CURRENT pair budget (the training loop may have grown it past
    mesh.pair_budget) and flags any dropped pairs — a dropped pair means the
    reported PSNR understates the model."""
    budget = pair_budget if pair_budget is not None else mesh.pair_budget
    configs = [
        ("test", scene.get_test_cameras()),
        ("train", scene.get_train_cameras()[:5]),
    ]
    for name, cams in configs:
        if not cams:
            continue
        losses, psnrs, dropped = [], [], 0
        for cam in cams:
            l, p, nd = eval_step(
                g, cam, bg,
                lambda_dssim=opt.lambda_dssim,
                tile_size=mesh.tile_size,
                chunk=mesh.chunk_size,
                pair_budget=budget,
            )
            losses.append(float(l))
            psnrs.append(float(p))
            dropped += int(nd)
        printer.print(
            f"[iter {iteration}] eval {name}: loss {np.mean(losses):.5f} "
            f"PSNR {np.mean(psnrs):.2f}"
            + (f" [WARNING: {dropped} pairs dropped — PSNR understated; "
               f"raise --pair_budget]" if dropped else "")
        )
        if metrics is not None:
            metrics.log(
                iteration,
                **{f"{name}_loss": float(np.mean(losses)),
                   f"{name}_psnr": float(np.mean(psnrs))},
            )


def _grow_opt_state(s: AdamState, new_cap: int) -> AdamState:
    zpad = lambda a: jnp.concatenate(
        [a, jnp.zeros((new_cap - a.shape[0],) + a.shape[1:], a.dtype)], axis=0
    )
    return AdamState(
        mu={k: zpad(v) for k, v in s.mu.items()},
        nu={k: zpad(v) for k, v in s.nu.items()},
        count=s.count,
    )
