"""Reference (oracle) rasterizer: pure jnp, per-pixel alpha compositing via lax.scan.

This is the numerically-trusted implementation the Pallas kernels are validated
against (SURVEY.md §4 lesson: 'numerical parity tests of the Pallas rasterizer
fwd/bwd against a pure-jnp per-pixel compositor + jax.grad'). O(N * H * W) - only
for tests and tiny scenes.

Semantics (matching the Pallas path and upstream 3DGS):
- Gaussians composited in (depth, index) order (stable sort),
- a Gaussian covers exactly the pixels whose tile lies in its tile rectangle,
- alpha = opacity * exp(power), zeroed below 1/255, clamped at 0.99,
- no early termination (the 1e-4 transmittance cutoff is a compute-skip
  optimization in the Pallas kernel, applied at chunk granularity; exact
  compositing differs from it by < 1e-4 in T, inside test tolerances).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gsplat_tpu.render.binning import depth_shift, tile_grid, tile_rects
from gsplat_tpu.render.project import Projection

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99


def composite_reference(
    proj: Projection,
    *,
    width: int,
    height: int,
    tile_size: int,
    bg: jnp.ndarray,
) -> jnp.ndarray:
    """Render (H, W, 3) by scanning Gaussians in depth order over the full image."""
    n = proj.mean2d.shape[0]
    tw, th = tile_grid(width, height, tile_size)
    x0, y0, x1, y1 = tile_rects(proj.mean2d, proj.radius, tw, th, tile_size)

    # depth quantized exactly as the Pallas path's packed sort key
    # (binning.pack_sort_key): near-ties compose in Gaussian-index order there,
    # and the oracle must composite in the same order to be a bitwise-order
    # parity reference
    db = depth_shift(tw * th)
    dq = jax.lax.shift_right_logical(
        jnp.where(proj.radius > 0, proj.depth, jnp.inf)
        .astype(jnp.float32).view(jnp.int32),
        32 - db,
    )
    order = jnp.argsort(dq, stable=True)
    mean2d = proj.mean2d[order]
    conic = proj.conic[order]
    rgb = proj.rgb[order]
    opacity = jnp.where(proj.radius[order] > 0, proj.opacity[order], 0.0)
    rx0, ry0, rx1, ry1 = x0[order], y0[order], x1[order], y1[order]

    px = jnp.arange(width, dtype=jnp.float32)[None, :]
    py = jnp.arange(height, dtype=jnp.float32)[:, None]
    ptx = (jnp.arange(width, dtype=jnp.int32) // tile_size)[None, :]
    pty = (jnp.arange(height, dtype=jnp.int32) // tile_size)[:, None]

    def step(carry, g):
        acc, T = carry
        m, cn, col, op, gx0, gy0, gx1, gy1 = g
        dx = m[0] - px
        dy = m[1] - py
        power = -0.5 * (cn[0] * dx * dx + cn[2] * dy * dy) - cn[1] * dx * dy
        alpha = op * jnp.exp(power)
        covered = (ptx >= gx0) & (ptx < gx1) & (pty >= gy0) & (pty < gy1)
        alpha = jnp.where(covered & (power <= 0.0), alpha, 0.0)
        alpha = jnp.minimum(alpha, ALPHA_MAX)
        alpha = jnp.where(alpha < ALPHA_MIN, 0.0, alpha)
        w = alpha * T
        acc = acc + w[..., None] * col[None, None, :]
        T = T * (1.0 - alpha)
        return (acc, T), None

    acc0 = jnp.zeros((height, width, 3), jnp.float32)
    T0 = jnp.ones((height, width), jnp.float32)
    (acc, T), _ = jax.lax.scan(
        step, (acc0, T0), (mean2d, conic, rgb, opacity, rx0, ry0, rx1, ry1)
    )
    return acc + T[..., None] * bg[None, None, :]
