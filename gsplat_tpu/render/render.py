"""End-to-end differentiable render: project -> bin -> gather -> composite -> image.

The public `render()` mirrors what upstream 3DGS's `render(viewpoint, gaussians,
pipe, bg)` returns (image, viewspace point grads hook, visibility filter, radii) —
the capability the reference's PipelineParams hooks anticipate but never implement
(src/arguments/params.h:93-106, SURVEY.md §1 'missing layer L2.5').

Differentiation strategy (TPU-first):
- projection / SH / attr packing: plain jnp, autodiff.
- binning: integer-valued, stop-gradient.
- per-pair gather `attrs[padded_gid]`: autodiff's transpose is a scatter-add,
  which IS the per-Gaussian gradient accumulation (no atomics needed on TPU).
- tile compositing: Pallas kernels behind `composite_tiles`' custom_vjp.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gsplat_tpu.core.camera import Camera
from gsplat_tpu.core.gaussians import Gaussians
from gsplat_tpu.render.binning import Binning, bin_gaussians, tile_grid
from gsplat_tpu.render.project import Projection, project_gaussians
from gsplat_tpu.render.raster_pallas import composite_tiles, pack_attrs, untile_image


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
    tile_size: int = 16,
    chunk: int = 64,
    pair_budget: int = 1 << 18,
    scaling_modifier: float = 1.0,
    override_color: Optional[jnp.ndarray] = None,
    mean2d_offset: Optional[jnp.ndarray] = None,
    interpret: Optional[bool] = None,
) -> RenderOutput:
    """Render `g` through `cam` over background `bg` (3,).

    mean2d_offset: optional zeros (N,2); pass it and differentiate w.r.t. it to get
    the screen-space positional gradient used by densification.
    interpret: force Pallas interpreter mode (defaults to True off-TPU).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    width, height = cam.width, cam.height
    tw, th = tile_grid(width, height, tile_size)
    num_tiles = tw * th

    proj = project_gaussians(
        g, cam, scaling_modifier=scaling_modifier,
        override_color=override_color, mean2d_offset=mean2d_offset,
    )

    binning = bin_gaussians(
        jax.lax.stop_gradient(proj.mean2d),
        proj.radius,
        jax.lax.stop_gradient(proj.depth),
        width=width, height=height, tile_size=tile_size,
        chunk=chunk, pair_budget=pair_budget,
    )

    # differentiable per-Gaussian attrs with an inert null row at index N
    attrs = pack_attrs(proj.mean2d, proj.conic, proj.rgb, proj.opacity)
    attrs = jnp.concatenate([attrs, jnp.zeros((1, attrs.shape[1]), attrs.dtype)], axis=0)
    gathered = attrs[binning.padded_gid]

    static = (num_tiles, tw, tile_size, chunk, bool(interpret))
    tiles = composite_tiles(gathered, binning.chunk_tile, static)

    # tiles with zero pairs are never visited by the kernel: splice in the empty value
    visited = (binning.tile_count > 0)[:, None, None]
    empty = jnp.concatenate(
        [jnp.zeros((1, 3, tile_size * tile_size), jnp.float32),
         jnp.ones((1, 1, tile_size * tile_size), jnp.float32)],
        axis=1,
    )
    tiles = jnp.where(visited, tiles, empty)

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
    tile_size: int = 16,
    scaling_modifier: float = 1.0,
    override_color: Optional[jnp.ndarray] = None,
    mean2d_offset: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Oracle render (pure jnp per-pixel compositor; tests/tiny scenes only)."""
    from gsplat_tpu.render.raster_ref import composite_reference

    proj = project_gaussians(
        g, cam, scaling_modifier=scaling_modifier,
        override_color=override_color, mean2d_offset=mean2d_offset,
    )
    return composite_reference(
        proj, width=cam.width, height=cam.height, tile_size=tile_size, bg=bg
    )
