"""End-to-end differentiable render: project -> bin -> gather -> composite -> image.

The public `render()` mirrors what upstream 3DGS's `render(viewpoint, gaussians,
pipe, bg)` returns (image, viewspace point grads hook, visibility filter, radii) —
the capability the reference's PipelineParams hooks anticipate but never implement
(src/arguments/params.h:93-106, SURVEY.md §1 'missing layer L2.5').

Differentiation strategy (TPU-first):
- projection / SH / attr packing: plain jnp, autodiff.
- binning: integer-valued, stop-gradient.
- per-pair gather: custom VJP (`_gather_pairs_t`) — per-Gaussian gradient
  accumulation via an expansion-order permutation + cumsum-diff segment
  reduction (no atomics needed on TPU, and ~2x faster than the XLA scatter-add
  the autodiff transpose would emit).
- tile compositing: Pallas kernels behind `composite_tiles`' custom_vjp.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu.core.camera import Camera
from gsplat_tpu.core.gaussians import Gaussians
from gsplat_tpu.render.binning import bin_gaussians, tile_grid
from gsplat_tpu.render.project import project_gaussians
from gsplat_tpu.render.raster_pallas import composite_tiles, pack_attrs, untile_image


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _gather_pairs_t(attrs, padded_gid, padded_eid, gauss_offsets, gauss_cum,
                    pair_budget):
    """Per-pair attribute gather (N+1,16) -> (16, padded_budget), with a
    hand-written transpose: the autodiff transpose of this gather is a scatter-add
    over the padded slots (measured 475ms at 4M pairs on v5e); instead we permute
    the cotangents into EXPANSION order — where pairs are grouped contiguously per
    Gaussian — and segment-reduce with one cumsum + boundary differences
    (69 + 125 + 90 ms for the same workload)."""
    return attrs[padded_gid].T


def _gather_pairs_fwd(attrs, padded_gid, padded_eid, gauss_offsets, gauss_cum,
                      pair_budget):
    return (
        attrs[padded_gid].T,
        (padded_gid, padded_eid, gauss_offsets, gauss_cum, attrs.shape[0]),
    )


def _gather_pairs_bwd(pair_budget, res, d_t):
    padded_gid, padded_eid, offsets, cum, n_rows = res
    pad = d_t.shape[1]
    attr_dim = d_t.shape[0]
    # expansion slot -> padded slot (a permutation on the valid pairs); slots
    # with no pair keep `pad`, which indexes the appended zero row below
    inv_e = jnp.full((pair_budget,), pad, jnp.int32).at[padded_eid].set(
        jnp.arange(pad, dtype=jnp.int32), mode="drop", unique_indices=True
    )
    d_rows = jnp.concatenate(
        [d_t.T, jnp.zeros((1, attr_dim), d_t.dtype)], axis=0
    )[inv_e]
    S = jnp.concatenate(
        [jnp.zeros((1, attr_dim), d_t.dtype), jnp.cumsum(d_rows, axis=0)], axis=0
    )
    # offsets[g] == cum[g-1] (contiguous ordered segments), so ONE boundary
    # gather + an adjacent diff replaces gathering S at both offsets and cum
    # (row gathers cost ~28ns/row on v5e — this saves a full N-row gather)
    T_b = S[cum]                  # (N, 16)
    d_live = T_b - jnp.concatenate(
        [jnp.zeros((1, attr_dim), d_t.dtype), T_b[:-1]], axis=0
    )
    d_attrs = jnp.concatenate(
        [d_live, jnp.zeros((n_rows - d_live.shape[0], attr_dim), d_t.dtype)], axis=0
    )
    zero_i = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return d_attrs, zero_i(padded_gid), zero_i(padded_eid), zero_i(offsets), zero_i(cum)


_gather_pairs_t.defvjp(_gather_pairs_fwd, _gather_pairs_bwd)


class RenderOutput(NamedTuple):
    image: jnp.ndarray        # (H, W, 3) final (bg-composited) image
    transmittance: jnp.ndarray  # (H, W) final per-pixel transmittance
    radii: jnp.ndarray        # (N,) projected pixel radii (stop-grad)
    visible: jnp.ndarray      # (N,) bool visibility filter
    n_pairs: jnp.ndarray      # () int32 live pair count (budget telemetry)
    n_dropped: jnp.ndarray    # () int32 pairs dropped by budget overflow


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
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    width, height = cam.width, cam.height
    y0 = None
    if region is not None:
        y0, height = region
    tw, th = tile_grid(width, height, tile_size)
    num_tiles = tw * th

    proj = project_gaussians(
        g, cam, scaling_modifier=scaling_modifier,
        override_color=override_color, mean2d_offset=mean2d_offset,
    )
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
    )

    # differentiable per-Gaussian attrs with an inert null row at index N; the
    # kernel consumes them transposed (16, P) for DMA lane alignment
    attrs = pack_attrs(proj.mean2d, proj.conic, proj.rgb, proj.opacity)
    attrs = jnp.concatenate([attrs, jnp.zeros((1, attrs.shape[1]), attrs.dtype)], axis=0)
    gathered_t = _gather_pairs_t(
        attrs, binning.padded_gid, binning.padded_eid,
        binning.gauss_offsets, binning.gauss_cum, pair_budget,
    )

    if not interpret and chunk % 128 != 0:
        raise ValueError(f"chunk must be a multiple of 128 on TPU, got {chunk}")
    static = (num_tiles, tw, tile_size, chunk, bool(interpret))
    tiles = composite_tiles(gathered_t, binning.tile_start, binning.tile_chunks, static)

    rgb, transmittance = untile_image(tiles, tw, th, tile_size, width, height)
    image = rgb + transmittance[..., None] * bg[None, None, :]
    return RenderOutput(
        image=image,
        transmittance=transmittance,
        radii=proj.radius,
        visible=proj.visible,
        n_pairs=binning.n_pairs,
        n_dropped=binning.n_dropped,
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
    from gsplat_tpu.render.raster_ref import composite_reference

    proj = project_gaussians(
        g, cam, scaling_modifier=scaling_modifier,
        override_color=override_color, mean2d_offset=mean2d_offset,
    )
    return composite_reference(
        proj, width=cam.width, height=cam.height, tile_size=tile_size, bg=bg
    )
