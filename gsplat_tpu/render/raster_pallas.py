"""Pallas TPU tile-compositing kernels (forward + hand-written backward).

TPU-native replacement for upstream's CUDA `diff-gaussian-rasterization` tile loop
(the reference lacks it entirely; SURVEY.md §0, §7 M2/M3). Design:

- The kernel grid is a dense 1-D sweep over chunk-aligned (Gaussian,tile) pair
  blocks produced by `render.binning` (sorted by (tile, depth)). The output image
  lives as per-tile blocks `(num_tiles, 4, NPIX)` (rgb accum + transmittance,
  NPIX = tile_size^2 lanes); a chunk's output block index comes from the
  scalar-prefetched `chunk_tile` map, so consecutive chunks of one tile revisit
  the same VMEM block (classic TPU accumulation pattern — no atomics).
- Front-to-back compositing is vectorized *within* a chunk: per-chunk exclusive
  transmittance via cumulative log1p(-alpha) (exact in exact arithmetic), with the
  running per-pixel transmittance carried in the output block across chunks.
- The backward kernel re-sweeps the same chunk order front-to-back, reconstructing
  per-pair transmittance and prefix color-dot-cotangent sums; per-pair gradients
  for (mean2d, conic, rgb, opacity) are written to this chunk's own `(chunk, 16)`
  block — each pair is owned by exactly one tile, so there are no write conflicts.
  Per-Gaussian accumulation happens outside via the autodiff transpose of the
  binning gather (an XLA scatter-add / segment-sum), SURVEY.md §7 hard part 1.
- The 1e-4 transmittance early-exit of upstream is applied at chunk granularity
  (identically in fwd and bwd, keeping gradients self-consistent).

Attr row layout (16 f32 lanes):
  0 mean_x | 1 mean_y | 2 conic_a | 3 conic_b | 4 conic_c | 5..7 rgb | 8 opacity |
  9..15 zero padding (keeps blocks lane-aligned and leaves room for depth/extras).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4
ATTR_DIM = 16


def pack_attrs(mean2d, conic, rgb, opacity) -> jnp.ndarray:
    """(N,2),(N,3),(N,3),(N,) -> (N,16) kernel attribute rows (differentiable)."""
    n = mean2d.shape[0]
    pad = jnp.zeros((n, ATTR_DIM - 9), jnp.float32)
    return jnp.concatenate(
        [mean2d, conic, rgb, opacity[:, None], pad], axis=1
    ).astype(jnp.float32)


def _pixel_coords(ct, tw: int, tile_size: int, npix: int):
    """Global (x,y) pixel coordinates of tile `ct` as (1, npix) f32 rows."""
    ty = ct // tw
    tx = ct % tw
    pix = jax.lax.broadcasted_iota(jnp.int32, (1, npix), 1)
    px = (tx * tile_size + pix % tile_size).astype(jnp.float32)
    py = (ty * tile_size + pix // tile_size).astype(jnp.float32)
    return px, py


def _cumsum0(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumsum along axis 0 as a lower-triangular matmul — Mosaic has no
    cumsum lowering, and an (C,C)x(C,P) triangular matmul rides the MXU anyway."""
    c = x.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    tri = (row >= col).astype(x.dtype)
    return jax.lax.dot_general(
        tri, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _chunk_alphas(attrs, px, py):
    """Shared fwd/bwd math: per-(pair,pixel) alpha with upstream masking.

    Returns (alpha, chain_mask, G, dx, dy) — alpha is the effective composited
    value; chain_mask is d(alpha)/d(raw) (1 where unclamped & unskipped)."""
    mx = attrs[:, 0:1]
    my = attrs[:, 1:2]
    ca = attrs[:, 2:3]
    cb = attrs[:, 3:4]
    cc = attrs[:, 4:5]
    op = attrs[:, 8:9]
    dx = mx - px
    dy = my - py
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    G = jnp.exp(jnp.minimum(power, 0.0))
    raw = op * G
    ok = (power <= 0.0) & (raw >= ALPHA_MIN) & (raw <= ALPHA_MAX)
    alpha = jnp.where(ok, raw, jnp.where((power <= 0.0) & (raw > ALPHA_MAX), ALPHA_MAX, 0.0))
    return alpha, ok.astype(jnp.float32), G, dx, dy


def _fwd_kernel(ct_ref, attrs_ref, out_ref, *, tw: int, tile_size: int):
    npix = tile_size * tile_size
    k = pl.program_id(0)
    ct = ct_ref[k]
    prev = ct_ref[jnp.maximum(k - 1, 0)]
    is_first = (k == 0) | (ct != prev)

    @pl.when(is_first)
    def _():
        out_ref[0, :3, :] = jnp.zeros((3, npix), jnp.float32)
        out_ref[0, 3, :] = jnp.ones((npix,), jnp.float32)

    T = out_ref[0, 3, :]

    @pl.when(jnp.max(T) >= T_EPS)
    def _():
        attrs = attrs_ref[:]
        px, py = _pixel_coords(ct, tw, tile_size, npix)
        alpha, _, _, _, _ = _chunk_alphas(attrs, px, py)
        lg = jnp.log1p(-alpha)
        cum = _cumsum0(lg)
        t_exc = jnp.exp(cum - lg)  # exclusive in-chunk transmittance
        w = alpha * t_exc * T[None, :]
        rgb = attrs[:, 5:8]
        out_ref[0, :3, :] = out_ref[0, :3, :] + jax.lax.dot_general(
            rgb, w, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        out_ref[0, 3, :] = T * jnp.exp(jnp.sum(lg, axis=0))


def _bwd_kernel(
    ct_ref, attrs_ref, res_ref, g_ref, d_ref, carry_ref, *, tw: int, tile_size: int
):
    npix = tile_size * tile_size
    k = pl.program_id(0)
    ct = ct_ref[k]
    prev = ct_ref[jnp.maximum(k - 1, 0)]
    is_first = (k == 0) | (ct != prev)

    @pl.when(is_first)
    def _():
        carry_ref[0, :] = jnp.ones((npix,), jnp.float32)   # running transmittance
        carry_ref[1, :] = jnp.zeros((npix,), jnp.float32)  # prefix sum of w*(c.g)

    d_ref[:] = jnp.zeros((attrs_ref.shape[0], ATTR_DIM), jnp.float32)
    t_run = carry_ref[0, :]

    @pl.when(jnp.max(t_run) >= T_EPS)
    def _():
        attrs = attrs_ref[:]
        px, py = _pixel_coords(ct, tw, tile_size, npix)
        alpha, chain, G, dx, dy = _chunk_alphas(attrs, px, py)
        ca = attrs[:, 2:3]
        cb = attrs[:, 3:4]
        cc = attrs[:, 4:5]
        rgb = attrs[:, 5:8]
        op = attrs[:, 8:9]

        lg = jnp.log1p(-alpha)
        cum = _cumsum0(lg)
        t_exc = jnp.exp(cum - lg)
        t_i = t_exc * t_run[None, :]
        w = alpha * t_i

        g_rgb = g_ref[0, :3, :]          # (3, npix)
        g_t = g_ref[0, 3, :]             # (npix,)
        res_rgb = res_ref[0, :3, :]
        t_final = res_ref[0, 3, :]
        total_cg = jnp.sum(res_rgb * g_rgb, axis=0)  # (npix,)

        cg = jax.lax.dot_general(
            rgb, g_rgb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (chunk, npix)
        wcg = w * cg
        prefix = _cumsum0(wcg) + carry_ref[1, :][None, :]
        denom = 1.0 - alpha
        dalpha = t_i * cg - (
            total_cg[None, :] - prefix + (t_final * g_t)[None, :]
        ) / denom
        dalpha = dalpha * chain

        d_rgb = jax.lax.dot_general(
            w, g_rgb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (chunk, 3)
        d_op = jnp.sum(G * dalpha, axis=1, keepdims=True)
        dpow = op * G * dalpha
        d_ca = jnp.sum(-0.5 * dx * dx * dpow, axis=1, keepdims=True)
        d_cb = jnp.sum(-dx * dy * dpow, axis=1, keepdims=True)
        d_cc = jnp.sum(-0.5 * dy * dy * dpow, axis=1, keepdims=True)
        d_mx = jnp.sum(-(ca * dx + cb * dy) * dpow, axis=1, keepdims=True)
        d_my = jnp.sum(-(cb * dx + cc * dy) * dpow, axis=1, keepdims=True)

        zeros = jnp.zeros((attrs.shape[0], ATTR_DIM - 9), jnp.float32)
        d_ref[:] = jnp.concatenate(
            [d_mx, d_my, d_ca, d_cb, d_cc, d_rgb, d_op, zeros], axis=1
        )

        carry_ref[1, :] = prefix[attrs.shape[0] - 1, :]
        carry_ref[0, :] = t_run * jnp.exp(jnp.sum(lg, axis=0))


def _fwd_call(attrs, chunk_tile, *, num_tiles, tw, tile_size, chunk, interpret):
    npix = tile_size * tile_size
    num_chunks = chunk_tile.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, ATTR_DIM), lambda k, ct: (k, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 4, npix), lambda k, ct: (ct[k], 0, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, tw=tw, tile_size=tile_size),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, 4, npix), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(chunk_tile, attrs)


def _bwd_call(attrs, chunk_tile, res, g, *, num_tiles, tw, tile_size, chunk, interpret):
    npix = tile_size * tile_size
    num_chunks = chunk_tile.shape[0]
    tile_block = pl.BlockSpec(
        (1, 4, npix), lambda k, ct: (ct[k], 0, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, ATTR_DIM), lambda k, ct: (k, 0), memory_space=pltpu.VMEM),
            tile_block,
            tile_block,
        ],
        out_specs=pl.BlockSpec(
            (chunk, ATTR_DIM), lambda k, ct: (k, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((2, npix), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, tw=tw, tile_size=tile_size),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(attrs.shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(chunk_tile, attrs, res, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def composite_tiles(attrs, chunk_tile, static):
    """attrs (padded_budget, 16) sorted+gathered pair rows; chunk_tile (num_chunks,)
    int32 -> tiles (num_tiles, 4, npix): rgb accumulation + final transmittance.

    `static`: hashable tuple (num_tiles, tw, tile_size, chunk, interpret).
    """
    num_tiles, tw, tile_size, chunk, interpret = static
    return _fwd_call(
        attrs, chunk_tile,
        num_tiles=num_tiles, tw=tw, tile_size=tile_size, chunk=chunk,
        interpret=interpret,
    )


def _composite_fwd(attrs, chunk_tile, static):
    out = composite_tiles(attrs, chunk_tile, static)
    return out, (attrs, chunk_tile, out)


def _composite_bwd(static, residuals, g):
    num_tiles, tw, tile_size, chunk, interpret = static
    attrs, chunk_tile, out = residuals
    d_attrs = _bwd_call(
        attrs, chunk_tile, out, g,
        num_tiles=num_tiles, tw=tw, tile_size=tile_size, chunk=chunk,
        interpret=interpret,
    )
    d_chunk_tile = np.zeros(chunk_tile.shape, jax.dtypes.float0)
    return d_attrs, d_chunk_tile


composite_tiles.defvjp(_composite_fwd, _composite_bwd)


def untile_image(tiles: jnp.ndarray, tw: int, th: int, tile_size: int,
                 width: int, height: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(num_tiles, 4, npix) -> (H, W, 3) rgb accum and (H, W) transmittance."""
    t = tiles.reshape(th, tw, 4, tile_size, tile_size)
    img = jnp.transpose(t, (2, 0, 3, 1, 4)).reshape(4, th * tile_size, tw * tile_size)
    img = img[:, :height, :width]
    return jnp.transpose(img[:3], (1, 2, 0)), img[3]
