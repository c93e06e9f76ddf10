"""End-to-end differentiable render: project -> bin -> gather -> composite -> image.

The public `render()` mirrors what upstream 3DGS's `render(viewpoint, gaussians,
pipe, bg)` returns (image, viewspace point grads hook, visibility filter, radii) —
the capability the reference's PipelineParams hooks anticipate but never implement
(src/arguments/params.h:93-106, SURVEY.md §1 'missing layer L2.5').

Differentiation strategy (TPU-first, round-2 layout):
- projection / SH / attr packing: plain jnp, autodiff.
- binning: integer-valued, stop-gradient.
- gather + tile compositing + per-Gaussian gradient reduction: ONE fused
  custom_vjp (`_rasterize`). Forward gathers per-pair attributes into the
  compact sorted layout (each row carrying its Gaussian id in attr row 9) and
  runs the Pallas forward kernel. Backward runs the Pallas backward kernel —
  whose d-rows land in per-tile chunk-aligned regions, each carrying its own
  gid key — then reduces per Gaussian with ONE `lax.sort` by key + a cumsum +
  segment-boundary difference. No scatter, no padded-layout permutation maps
  (the round-1 design spent ~120 ms/step on those at 1M Gaussians @1080p).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu.core.camera import Camera
from gsplat_tpu.core.gaussians import Gaussians
from gsplat_tpu.render.binning import bin_gaussians, out_budget, tile_grid
from gsplat_tpu.render.raster_pallas import (
    ATTR_DIM,
    _PACK_DEFAULT,
    composite_bwd,
    composite_fwd,
    pack_attrs,
    pack_attrs8,
    untile_image,
)

N_DCOLS = 9  # d rows carrying gradients: mean2d(2) conic(3) rgb(3) opacity(1)


def _gather_with_gid(attrs, gid_s, attr_pack):
    """(N+1,16),(P,) -> (16,P) [or (8,P) packed]: attribute rows + a row of
    gid as an f32 VALUE (exact below 2^24; raw int bits would be denormals TPU
    float paths flush to zero) + zeros.

    attr_pack: gather the 7-column packed table (rgb/opacity as bf16 pairs,
    raster_pallas.pack_attrs8) instead of 9 f32 columns — the budget-long
    P-row gather prices by row width in tiers (<=8 cols ~0.7x the 9-16 tier,
    BASELINE.md round 4), and the kernels' attr DMA halves."""
    p = gid_s.shape[0]
    gid_f = gid_s.astype(jnp.float32)[:, None]
    if attr_pack:
        g7 = pack_attrs8(attrs)[gid_s]                   # (P, 7) row gather
        return jnp.concatenate([g7, gid_f], axis=1).T
    g9 = attrs[:, :N_DCOLS][gid_s]                       # (P, 9) row gather
    zeros = jnp.zeros((p, ATTR_DIM - N_DCOLS - 1), jnp.float32)
    return jnp.concatenate([g9, gid_f, zeros], axis=1).T


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _rasterize(attrs, gid_s, tile_start, tile_count, grad_ok, static):
    """attrs (N+1,16) differentiable per-Gaussian attributes (row N inert null);
    binning tables int32 (stop-grad); grad_ok () bool (False on kept-budget
    overflow -> that step's gradients are zeroed, see binning.bin_gaussians).
    -> (tiles (num_tiles, 4, npix), nproc (num_tiles,) int32)."""
    (num_tiles, tw, tile_size, chunk, pair_budget, c_budget, interpret,
     attr_pack) = static
    gathered_t = _gather_with_gid(attrs, gid_s, attr_pack)
    return composite_fwd(
        gathered_t, tile_start, tile_count,
        num_tiles=num_tiles, tw=tw, tile_size=tile_size, chunk=chunk,
        interpret=interpret,
    )


def _rasterize_fwd(attrs, gid_s, tile_start, tile_count, grad_ok, static):
    (num_tiles, tw, tile_size, chunk, pair_budget, c_budget, interpret,
     attr_pack) = static
    gathered_t = _gather_with_gid(attrs, gid_s, attr_pack)
    tiles, nproc = composite_fwd(
        gathered_t, tile_start, tile_count,
        num_tiles=num_tiles, tw=tw, tile_size=tile_size, chunk=chunk,
        interpret=interpret,
    )
    res = (gathered_t, tile_start, tile_count, nproc, grad_ok,
           tiles, attrs.shape[0])
    return (tiles, nproc), res


def _rasterize_bwd(static, res, g):
    (num_tiles, tw, tile_size, chunk, pair_budget, c_budget, interpret,
     attr_pack) = static
    gathered_t, tile_start, tile_count, nproc, grad_ok, tiles, n_rows = res
    g_tiles = g[0]  # nproc is integer telemetry -> symbolic-zero cotangent

    # SATURATION COMPACTION (round 3): the forward kernel composited only
    # nproc[t] chunks per tile before transmittance saturated; every pair in a
    # later chunk gets exactly zero gradient under the truncated-forward
    # semantics. The backward d-array therefore holds ONLY the processed
    # chunks, packed into per-tile regions by this cumsum — on the dense bench
    # ~90% of kept pairs sit behind saturation, and the 10-operand gradient
    # sort below shrinks by the same factor (it was the single largest line of
    # the round-2 dense profile at 296 ms).
    cmax = c_budget // chunk
    np_c = jnp.minimum(nproc, cmax)
    sizes = np_c * chunk
    cum_sz = jnp.cumsum(sizes)
    total = cum_sz[-1]
    overflow = total > c_budget
    # overflow safety: clamp regions into the buffer (writes may then overlap
    # between tiles — harmless, the whole gradient is zeroed below)
    comp_start = jnp.minimum(cum_sz - sizes, c_budget - sizes).astype(jnp.int32)

    d_t = composite_bwd(
        gathered_t, tile_start, tile_count, comp_start, np_c, tiles, g_tiles,
        num_tiles=num_tiles, tw=tw, tile_size=tile_size, chunk=chunk,
        p_out=c_budget, interpret=interpret,
    )  # (16, c_budget); row 9 = per-row gid key, KEY_INVALID on masked/pad rows

    # per-Gaussian reduction: ONE sort by gid key groups every contributing
    # pair's d-row contiguously in gid order; per-Gaussian boundaries come
    # from a searchsorted over the sorted key row (the d-array is a SUBSET of
    # the kept pairs, so binning-side counts cannot locate them).
    # The key is the f32 gid value carried in d row 9 (sorts correctly as a
    # float; masked/unwritten rows carry KEY_INVALID and sort last).
    # Deliberately a 10-OPERAND sort: sorting (key, iota) and applying the
    # permutation afterwards as a row gather was measured SLOWER on v5e at
    # both densities (sparse 304->348 ms, dense 1492->2053 ms/step) — the
    # transpose out of the kernel's (16, P) layout plus the budget-long random
    # gather cost more than dragging 9 extra f32 operands through every
    # compare-exchange pass of the sort.
    sorted_ops = jax.lax.sort(
        (d_t[N_DCOLS],) + tuple(d_t[i] for i in range(N_DCOLS)), num_keys=1,
        is_stable=False,
    )
    key_s = sorted_ops[0]
    n_gauss = n_rows - 1
    # zero the whole step's gradient on either overflow (kept-budget overflow
    # flagged by binning, or contrib-budget overflow detected above); the
    # driver's adaptive budgets regrow and the step is repeated semantically
    # (upstream has no analogue — budgets are the static-shape price).
    scale = (grad_ok & jnp.logical_not(overflow)).astype(jnp.float32)

    # Per-Gaussian sums off the sorted rows via a 16-wide cumsum table +
    # boundary positions + an adjacent difference. (The 16-wide layout: the
    # boundary row gather out of a 9-wide table runs ~5x slower per row than
    # out of the 64-byte-row (N,16) layout.) DESIGN NOTE (rounds 2-4, twice
    # measured): fusing this whole block into one Pallas segment-reduction
    # kernel wins in isolation but flips XLA memory-space assignment into
    # staging ~15 f32[N] projection/VJP buffers through VMEM as async copies
    # (+170-190 ms/step) — first with a STACKED (16, P) operand
    # (segred_pallas, r2-3), then AGAIN with ten separate 1-D row operands
    # (segsum_pallas, r4: kernel 14.4 ms vs the ~18 ms it replaced, step
    # 183.9 -> 369.6 ms). The surviving rule: Pallas calls in this graph stay
    # cascade-free only with very few budget-long HBM operands
    # (bounds/compact/expand take 1-3). Both kernels are deleted; a row
    # scatter-add replacement loses 4x (scripts/micro_gradreduce.py).
    # DESIGN NOTE (round 5, third and FINAL attempt at fusing this block into
    # a Pallas kernel): a windowed equality-matmul kernel emitting the
    # per-Gaussian sums directly from the sorted d-rows, with only TWO
    # budget-long HBM operands (the key row + ONE (16, P) stacked d-table,
    # built by cheap contiguous axis-0 stacking) — i.e. inside what looked
    # like the cascade-free envelope — STILL triggered the XLA memory-space
    # cascade: sparse kept step 172.3 -> 367.3 ms (ab_step, r5). With segred
    # (r3, one (16,P) operand) and segsum (r4, ten 1-D operands) that makes
    # three shapes of the same kernel, all cascading; bounds/compact/expand
    # (1-3 ONE-DIMENSIONAL budget-long operands) stay clean. Refined rule:
    # a budget-long TWO-DIMENSIONAL operand into a Pallas call flips MSA
    # here regardless of operand count. The kernel was deleted; this XLA
    # chain (sort + 16-wide cumsum table + boundary kernel + row gather +
    # diff) is the shipped form.
    d_sorted = jnp.stack(
        sorted_ops[1:]
        + (ATTR_DIM - N_DCOLS) * (jnp.zeros_like(key_s),),
        axis=1,
    )                                                       # (c_budget, 16)
    S = jnp.concatenate(
        [jnp.zeros((1, ATTR_DIM), d_sorted.dtype),
         jnp.cumsum(d_sorted, axis=0)],
        axis=0,
    )
    # boundary positions: the windowed-count Pallas kernel replaces
    # searchsorted's query-into-key sort (prep fusion 12.3 + 2-op sort 5.8 ms
    # at the sparse bench) with a coarse 1k-query bracket + one DMA sweep of
    # the key row (bounds_pallas). GSPLAT_ENDS=xla keeps the fallback, which
    # also covers interpret mode and unaligned capacities.
    import os as _os

    from gsplat_tpu.render.bounds_pallas import GB as _ENDS_GB
    from gsplat_tpu.render.bounds_pallas import segment_ends

    if (not interpret and n_gauss % _ENDS_GB == 0
            and _os.environ.get("GSPLAT_ENDS", "pallas") != "xla"):
        ends = segment_ends(key_s, n_gauss, interpret=interpret)
    else:
        # method='sort': the default 'scan' binary search runs log2(P) rounds
        # of N-element gathers (~157 ms at N=1M on v5e — gathers price at
        # latency); one extra 2-operand sort over keys+queries costs ~7 ms
        ends = jnp.searchsorted(
            key_s, jnp.arange(1, n_gauss + 1, dtype=jnp.int32)
            .astype(jnp.float32), side="left", method="sort",
        )
    T_b = S[ends][:, :N_DCOLS]                              # (N, 9)
    d_live = T_b - jnp.concatenate(
        [jnp.zeros((1, N_DCOLS), T_b.dtype), T_b[:-1]], axis=0
    )
    d_live = d_live * scale
    d_attrs = jnp.concatenate(
        [d_live, jnp.zeros((n_rows - d_live.shape[0], N_DCOLS), d_live.dtype)],
        axis=0,
    )
    d_attrs = jnp.concatenate(
        [d_attrs, jnp.zeros((n_rows, ATTR_DIM - N_DCOLS), d_attrs.dtype)], axis=1
    )
    zero_i = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return (d_attrs, zero_i(jnp.zeros(gathered_t.shape[1], jnp.int32)),
            zero_i(tile_start), zero_i(tile_count), zero_i(grad_ok))


_rasterize.defvjp(_rasterize_fwd, _rasterize_bwd)


class RenderOutput(NamedTuple):
    image: jnp.ndarray        # (H, W, 3) final (bg-composited) image
    transmittance: jnp.ndarray  # (H, W) final per-pixel transmittance
    radii: jnp.ndarray        # (N,) projected pixel radii (stop-grad)
    visible: jnp.ndarray      # (N,) bool visibility filter
    n_pairs: jnp.ndarray      # () int32 live pair count (budget telemetry)
    n_dropped: jnp.ndarray    # () int32 pairs dropped by budget overflow
    n_culled: jnp.ndarray     # () int32 rect pairs removed by the tight tile cull
    n_contrib: jnp.ndarray    # () int32 pair slots composited before saturation
    #                           (chunk-granular; sizes contrib_budget adaptively)
    n_sat: jnp.ndarray        # () int32 chunk-aligned slots the saturation bound
    #                           cull kept (0 when off; sizes sat_budget adaptively)


def render(
    cam: Camera,
    g: Gaussians,
    bg: jnp.ndarray,
    *,
    tile_size: int = 32,
    chunk: int = 128,
    pair_budget: int = 1 << 18,
    scaling_modifier: float = 1.0,
    override_color: Optional[jnp.ndarray] = None,
    mean2d_offset: Optional[jnp.ndarray] = None,
    interpret: Optional[bool] = None,
    region: Optional[tuple] = None,
    tight_cull: bool = True,
    kept_budget: Optional[int] = None,
    contrib_budget: Optional[int] = None,
    sat_budget: Optional[int] = None,
    attr_pack: Optional[bool] = None,
) -> RenderOutput:
    """Render `g` through `cam` over background `bg` (3,).

    mean2d_offset: optional zeros (N,2); pass it and differentiate w.r.t. it to get
    the screen-space positional gradient used by densification.
    interpret: force Pallas interpreter mode (defaults to True off-TPU).
    region: optional (y0, region_height) horizontal band to rasterize — the
    projection uses the full camera, only tiling/compositing restricts to the
    band (the unit of intra-image spatial parallelism; y0 may be traced,
    region_height must be static).
    """
    from gsplat_tpu.render.project import project_gaussians

    # NOTE: wrapping this in jax.checkpoint to shed the projection residuals
    # was measured and rejected (sparse bench 215 -> 519 ms on v5e): the
    # recompute runs through the lane-padded (N,3)/(N,1) projection layouts
    # at ~1/42 HBM efficiency, far above what the saved residuals cost.
    proj = project_gaussians(
        g, cam, scaling_modifier=scaling_modifier,
        override_color=override_color, mean2d_offset=mean2d_offset,
    )
    return render_projected(
        proj, cam.width, cam.height, bg,
        tile_size=tile_size, chunk=chunk, pair_budget=pair_budget,
        interpret=interpret, region=region, tight_cull=tight_cull,
        kept_budget=kept_budget, contrib_budget=contrib_budget,
        sat_budget=sat_budget, attr_pack=attr_pack,
    )


def render_projected(
    proj,
    width: int,
    height: int,
    bg: jnp.ndarray,
    *,
    tile_size: int = 32,
    chunk: int = 128,
    pair_budget: int = 1 << 18,
    interpret: Optional[bool] = None,
    region: Optional[tuple] = None,
    tight_cull: bool = True,
    kept_budget: Optional[int] = None,
    contrib_budget: Optional[int] = None,
    sat_budget: Optional[int] = None,
    attr_pack: Optional[bool] = None,
) -> RenderOutput:
    """Bin + rasterize a pre-computed `Projection` (render.project.Projection).

    attr_pack: ride the per-pair attribute table as 8 packed columns (rgb and
    opacity bf16-quantized — see raster_pallas.pack_attrs8) instead of 16 f32
    rows; ~0.7x the gather cost and half the kernel attr DMA. Defaults to the
    GSPLAT_PACK env var (off).

    tight_cull drops bounding-rect (Gaussian, tile) pairs whose max alpha in
    the tile is provably < 1/255 (exact quadratic min over the tile box) — the
    rendered image is identical, the kernels sweep fewer chunks.

    kept_budget (< pair_budget) additionally sizes the post-sort stages (attr
    gather, kernels) by the culled pair count instead of the expansion slot
    count, since the sort compacts culled pairs to the tail. Kept overflow
    shows up in n_dropped exactly like slot overflow.

    contrib_budget sizes the BACKWARD d-array and the per-Gaussian gradient
    reduction by the pairs actually composited before the per-tile saturation
    early-exit (n_contrib telemetry; on dense scenes ~10% of kept pairs).
    Defaults to a capacity that can never overflow; when set lower and the
    compacted rows exceed it, that step's gradients are zeroed — the driver
    detects this as n_contrib > contrib_budget and regrows adaptively.

    sat_budget enables the SATURATION BOUND CULL (requires tight_cull): each
    tile's depth-ordered pairs are cut at the first chunk boundary where a
    conservative per-tile transmittance bound (quantized minimum alpha packed
    under the gid through the pair sort) proves the forward kernel early-exits
    — the attribute gather, kernels, and backward then run on the compacted
    survivors (sat_budget slots) instead of every kept pair. Bit-identical
    image and gradients; overflow zeroes gradients and reports in n_dropped
    like the other budgets. n_sat telemetry sizes the budget adaptively.

    Split out of `render()` so the sharded-Gaussian SPMD step can project each
    Gaussian shard on its owner device, exchange the (much smaller) projected
    attributes with all_to_all, and feed the full attr table here."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if attr_pack is None:
        # "auto": packed on the compiled TPU path, exact-f32 in interpret
        # mode (see raster_pallas._PACK_DEFAULT)
        attr_pack = (not interpret) if _PACK_DEFAULT is None else _PACK_DEFAULT
    y0 = None
    if region is not None:
        y0, height = region
    tw, th = tile_grid(width, height, tile_size)
    num_tiles = tw * th
    # the kernels DMA chunk-aligned supersets of segments: budgets must align
    pair_budget = -(-pair_budget // chunk) * chunk
    if kept_budget is None:
        kept_budget = pair_budget
    kept_budget = min(-(-kept_budget // chunk) * chunk, pair_budget)
    if contrib_budget is None:
        # worst case: every tile's aligned chunk range fully composited
        contrib_budget = out_budget(kept_budget, num_tiles, chunk)
    contrib_budget = -(-contrib_budget // chunk) * chunk
    if sat_budget is not None:
        if not tight_cull:
            raise ValueError("sat_budget requires tight_cull=True")
        sat_budget = min(-(-sat_budget // chunk) * chunk, pair_budget)

    if y0 is not None:
        shift = jnp.stack(
            [jnp.zeros((), jnp.float32), jnp.asarray(y0, jnp.float32)]
        )
        proj = proj._replace(mean2d=proj.mean2d - shift[None, :])

    binning = bin_gaussians(
        jax.lax.stop_gradient(proj.mean2d),
        proj.radius,
        jax.lax.stop_gradient(proj.depth),
        width=width, height=height, tile_size=tile_size,
        chunk=chunk, pair_budget=pair_budget,
        cull_conic=jax.lax.stop_gradient(proj.conic) if tight_cull else None,
        cull_opacity=(
            jax.lax.stop_gradient(proj.opacity) if tight_cull else None
        ),
        kept_budget=kept_budget,
        sat_budget=sat_budget,
        interpret=interpret,
    )

    # differentiable per-Gaussian attrs with an inert null row at index N
    attrs = pack_attrs(proj.mean2d, proj.conic, proj.rgb, proj.opacity)
    attrs = jnp.concatenate([attrs, jnp.zeros((1, attrs.shape[1]), attrs.dtype)], axis=0)

    if not interpret and chunk % 128 != 0:
        raise ValueError(f"chunk must be a multiple of 128 on TPU, got {chunk}")
    if attrs.shape[0] > (1 << 24):
        # gids ride the kernels as f32 VALUES (exact only below 2^24); beyond
        # that the gradient key sort would silently merge adjacent Gaussians
        # and misattribute gradients. Fail loudly instead.
        raise ValueError(
            f"capacity {attrs.shape[0] - 1} exceeds the 2^24 exact-f32-id "
            "limit of the gradient reduction"
        )
    # every post-sort stage sees only the kept prefix of the sorted pairs —
    # or, under the saturation bound cull, the compacted survivor regions
    post_budget = kept_budget if sat_budget is None else sat_budget
    gid_post = (binning.gid_s[:kept_budget] if sat_budget is None
                else binning.gid_s)
    static = (num_tiles, tw, tile_size, chunk, post_budget, contrib_budget,
              bool(interpret), bool(attr_pack))
    tiles, nproc = _rasterize(
        attrs, gid_post, binning.tile_start,
        binning.tile_count, binning.grad_ok, static,
    )

    rgb, transmittance = untile_image(tiles, tw, th, tile_size, width, height)
    image = rgb + transmittance[..., None] * bg[None, None, :]
    return RenderOutput(
        image=image,
        transmittance=transmittance,
        radii=proj.radius,
        visible=proj.visible,
        n_pairs=binning.n_pairs,
        n_dropped=binning.n_dropped,
        n_culled=binning.n_culled,
        n_contrib=jnp.sum(nproc) * chunk,
        n_sat=binning.n_sat,
    )


def render_reference(
    cam: Camera,
    g: Gaussians,
    bg: jnp.ndarray,
    *,
    tile_size: int = 32,
    scaling_modifier: float = 1.0,
    override_color: Optional[jnp.ndarray] = None,
    mean2d_offset: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Oracle render (pure jnp per-pixel compositor; tests/tiny scenes only).
    tile_size must match the Pallas path being compared: a Gaussian covers
    pixels by tile rectangle, so coverage semantics depend on it."""
    from gsplat_tpu.render.project import project_gaussians
    from gsplat_tpu.render.raster_ref import composite_reference

    proj = project_gaussians(
        g, cam, scaling_modifier=scaling_modifier,
        override_color=override_color, mean2d_offset=mean2d_offset,
    )
    return composite_reference(
        proj, width=cam.width, height=cam.height, tile_size=tile_size, bg=bg
    )
