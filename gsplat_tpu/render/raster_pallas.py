"""Pallas TPU tile-compositing kernels (forward + hand-written backward).

TPU-native replacement for upstream's CUDA `diff-gaussian-rasterization` tile loop
(the reference lacks it entirely; SURVEY.md §0, §7 M2/M3). Design:

- The kernel grid is the TILE GRID: one program per image tile. Each program
  streams its tile's sorted (Gaussian,tile) pair rows from HBM in chunk-sized
  blocks with double-buffered async DMA (offsets come from scalar-prefetched
  per-tile segment tables built by `render.binning`), composites front-to-back in
  VMEM, and early-exits the whole tile once transmittance saturates — upstream's
  per-pixel early-out applied at chunk granularity.
- Pair attributes live TRANSPOSED in HBM as (16, P): Mosaic requires DMA slices to
  be 128-lane-aligned in the minor dimension, so the sliced axis must be the pair
  axis (chunk is a multiple of 128 on hardware); it also puts per-pair rows on
  the full 128-lane VPU instead of wasting 112/128 lanes.
- The per-pair/per-pixel Gaussian evaluation is MXU-shaped: power(pair,pixel) is
  a bilinear form U(8,pair)^T @ V(8,pixel) where V = [px^2, py^2, px*py, px, py, 1]
  in TILE-LOCAL pixel coordinates (local coords keep the f32 cancellation error
  ~1e-5; global 1080p coordinates would lose ~3 digits). In-chunk front-to-back
  compositing is parallelized with an exclusive-transmittance prefix computed by
  a lower-triangular matmul in log space (exact in exact arithmetic), also MXU.
- The backward kernel re-sweeps the same chunks front-to-back, reconstructing
  per-pair transmittance and the prefix of color-dot-cotangent sums;
  dL/d{mean2d, conic, rgb, opacity} per pair chains through dU = V @ dpower^T
  (MXU again) and is DMA'd back to this tile's own segment of the d_attrs array —
  each pair is owned by exactly one tile, so there are NO write conflicts and no
  atomics (TPUs have none; SURVEY.md §7 hard part 1). Per-Gaussian gradient
  accumulation happens outside via the autodiff transpose of the binning gather
  (an XLA scatter-add / segment-sum).

Attr row layout (16 rows x P pairs):
  0 mean_x | 1 mean_y | 2 conic_a | 3 conic_b | 4 conic_c | 5..7 rgb | 8 opacity |
  9..15 zero padding.
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
    """(N,2),(N,3),(N,3),(N,) -> (N,16) attribute rows (differentiable)."""
    n = mean2d.shape[0]
    pad = jnp.zeros((n, ATTR_DIM - 9), jnp.float32)
    return jnp.concatenate(
        [mean2d, conic, rgb, opacity[:, None], pad], axis=1
    ).astype(jnp.float32)


def _pixel_basis(tile_size: int):
    """V (8, npix): [px^2, py^2, px*py, px, py, 1, 0, 0] in tile-local coords."""
    npix = tile_size * tile_size
    pix = jax.lax.broadcasted_iota(jnp.int32, (1, npix), 1)
    px = (pix % tile_size).astype(jnp.float32)
    py = (pix // tile_size).astype(jnp.float32)
    one = jnp.ones((1, npix), jnp.float32)
    zero = jnp.zeros((1, npix), jnp.float32)
    return jnp.concatenate([px * px, py * py, px * py, px, py, one, zero, zero], axis=0)


def _chunk_U(a, ox, oy):
    """a (16, chunk) transposed attr block -> U (8, chunk) bilinear coefficients in
    tile-local coordinates + raw rows for the backward chain."""
    mxl = a[0:1, :] - ox
    myl = a[1:2, :] - oy
    ca = a[2:3, :]
    cb = a[3:4, :]
    cc = a[4:5, :]
    op = a[8:9, :]
    zero = jnp.zeros_like(ca)
    U = jnp.concatenate(
        [
            -0.5 * ca,
            -0.5 * cc,
            -cb,
            ca * mxl + cb * myl,
            cc * myl + cb * mxl,
            -0.5 * (ca * mxl * mxl + cc * myl * myl) - cb * mxl * myl,
            zero,
            zero,
        ],
        axis=0,
    )
    return U, mxl, myl, ca, cb, cc, op


def _op_column(a):
    """Opacity as a (chunk, 1) column via one-hot matmul — Mosaic-safe transpose
    of the (1, chunk) attr row (the MXU does the lane->sublane move)."""
    e8 = (jax.lax.broadcasted_iota(jnp.int32, (ATTR_DIM, 1), 0) == 8).astype(
        jnp.float32
    )
    return _dg(a, e8, 0, 0)  # (chunk, 1)


def _alphas_from_power(power, op_col):
    """Upstream alpha masking: skip power>0, clamp at 0.99, zero below 1/255.
    power (chunk, npix); op_col (chunk, 1). Returns (alpha, chain_mask, G)."""
    G = jnp.exp(jnp.minimum(power, 0.0))
    raw = op_col * G  # broadcast (chunk,1) * (chunk,npix)
    ok = (power <= 0.0) & (raw >= ALPHA_MIN) & (raw <= ALPHA_MAX)
    alpha = jnp.where(
        ok, raw, jnp.where((power <= 0.0) & (raw > ALPHA_MAX), ALPHA_MAX, 0.0)
    )
    return alpha, ok.astype(jnp.float32), G


def _dg(a, b, ca, cb):
    """dot_general contracting axis ca of a with axis cb of b.

    precision=HIGHEST is load-bearing: TPU matmuls default to bf16 INPUT
    precision (preferred_element_type only sets the accumulator), and bf16
    truncation of the bilinear coefficients / log-transmittance terms is enough
    to destabilize training (observed: loss divergence after ~400 iters on v5e
    while the f32 CPU path converged)."""
    return jax.lax.dot_general(
        a, b, (((ca,), (cb,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _mm(a, b):
    return _dg(a, b, 1, 0)


def _tri(c: int, dtype) -> jnp.ndarray:
    row = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    return (row >= col).astype(dtype)


def _cumsum0(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumsum along axis 0 as lower-triangular matmuls (MXU; Mosaic has
    no cumsum lowering). Hierarchical: 32-row triangular blocks + sequential
    carry — the tri matmul cost is O(block * pixels) per pair, so 32-wide blocks
    cost 4x less than one 128-wide tri."""
    c = x.shape[0]
    sub = 32
    if c <= sub or c % sub != 0:
        return _mm(_tri(c, x.dtype), x)
    tri = _tri(sub, x.dtype)
    blocks = []
    carry = jnp.zeros((1, x.shape[1]), x.dtype)
    for i in range(c // sub):
        blk = _mm(tri, x[i * sub:(i + 1) * sub, :]) + carry
        blocks.append(blk)
        carry = blk[sub - 1:sub, :]
    return jnp.concatenate(blocks, axis=0)


def _fwd_kernel(
    ts_ref, tc_ref, attrs_hbm, out_ref, buf, sems, *, tw: int, tile_size: int, chunk: int
):
    npix = tile_size * tile_size
    i = pl.program_id(0)
    # binning guarantees chunk-aligned segment starts; chunk % 128 == 0 on hardware
    start = pl.multiple_of(ts_ref[i], chunk)
    nch = tc_ref[i]
    ox = ((i % tw) * tile_size).astype(jnp.float32)
    oy = ((i // tw) * tile_size).astype(jnp.float32)
    V = _pixel_basis(tile_size)

    def dma(slot, j):
        return pltpu.make_async_copy(
            attrs_hbm.at[:, pl.ds(start + j * chunk, chunk)], buf.at[slot], sems.at[slot]
        )

    @pl.when(nch > 0)
    def _():
        dma(0, 0).start()

    def cond(state):
        j, acc, T = state
        return (j < nch) & (jnp.max(T) >= T_EPS)

    def body(state):
        j, acc, T = state
        slot = j % 2

        @pl.when(j + 1 < nch)
        def _():
            dma((j + 1) % 2, j + 1).start()

        dma(slot, j).wait()
        a = buf[slot]                     # (16, chunk)
        U, _, _, _, _, _, _ = _chunk_U(a, ox, oy)
        power = _dg(U, V, 0, 0)           # (chunk, npix)
        alpha, _, _ = _alphas_from_power(power, _op_column(a))

        lg = jnp.log1p(-alpha)
        cum = _cumsum0(lg)
        t_exc = jnp.exp(cum - lg)
        w = alpha * t_exc * T             # (chunk, npix)
        acc = acc + _mm(a[5:8, :], w)     # rgb (3,chunk) @ w -> (3, npix)
        T = T * jnp.exp(jnp.sum(lg, axis=0, keepdims=True))
        return j + 1, acc, T

    j0 = jnp.zeros((), jnp.int32)
    acc0 = jnp.zeros((3, npix), jnp.float32)
    T0 = jnp.ones((1, npix), jnp.float32)
    j_end, acc, T = jax.lax.while_loop(cond, body, (j0, acc0, T0))

    # early exit leaves the j_end-th DMA in flight — retire it
    @pl.when(j_end < nch)
    def _():
        dma(j_end % 2, j_end).wait()

    out_ref[0, :3, :] = acc
    out_ref[0, 3:4, :] = T


def _bwd_kernel(
    ts_ref, tc_ref, attrs_hbm, res_ref, g_ref, d_hbm, ibuf, obuf, isems, osems,
    *, tw: int, tile_size: int, chunk: int,
):
    npix = tile_size * tile_size
    i = pl.program_id(0)
    # binning guarantees chunk-aligned segment starts; chunk % 128 == 0 on hardware
    start = pl.multiple_of(ts_ref[i], chunk)
    nch = tc_ref[i]
    ox = ((i % tw) * tile_size).astype(jnp.float32)
    oy = ((i // tw) * tile_size).astype(jnp.float32)
    V = _pixel_basis(tile_size)
    ones_pix = jnp.ones((1, npix), jnp.float32)

    g_rgb = g_ref[0, :3, :]          # (3, npix) cotangent of the rgb accumulation
    g_t = g_ref[0, 3:4, :]           # (1, npix) cotangent of final transmittance
    res_rgb = res_ref[0, :3, :]
    t_final = res_ref[0, 3:4, :]
    total_cg = jnp.sum(res_rgb * g_rgb, axis=0, keepdims=True)  # (1, npix)

    def idma(slot, j):
        return pltpu.make_async_copy(
            attrs_hbm.at[:, pl.ds(start + j * chunk, chunk)], ibuf.at[slot],
            isems.at[slot],
        )

    def odma(slot, j):
        return pltpu.make_async_copy(
            obuf.at[slot], d_hbm.at[:, pl.ds(start + j * chunk, chunk)], osems.at[slot]
        )

    @pl.when(nch > 0)
    def _():
        idma(0, 0).start()

    def body(j, carry):
        t_run, prefix = carry
        slot = j % 2

        @pl.when(j + 1 < nch)
        def _():
            idma((j + 1) % 2, j + 1).start()

        idma(slot, j).wait()
        # the write DMA that used this output slot two chunks ago must be done
        @pl.when(j >= 2)
        def _():
            odma(slot, j - 2).wait()

        a = ibuf[slot]
        alive = jnp.max(t_run) >= T_EPS

        def live(_):
            U, mxl, myl, ca, cb, cc, _ = _chunk_U(a, ox, oy)
            op_col = _op_column(a)
            power = _dg(U, V, 0, 0)
            alpha, chain, G = _alphas_from_power(power, op_col)
            rgb = a[5:8, :]

            lg = jnp.log1p(-alpha)
            cum = _cumsum0(lg)
            t_exc = jnp.exp(cum - lg)
            t_i = t_exc * t_run
            w = alpha * t_i

            cg = _dg(rgb, g_rgb, 0, 0)               # (chunk, npix)
            wcg = w * cg
            pref = _cumsum0(wcg) + prefix
            dalpha = t_i * cg - (total_cg - pref + t_final * g_t) / (1.0 - alpha)
            dalpha = dalpha * chain

            d_rgb = _dg(g_rgb, w, 1, 1)              # (3, chunk)
            gda = G * dalpha
            d_op = _dg(ones_pix, gda, 1, 1)          # (1, chunk)
            dpow = op_col * gda                      # (chunk, npix)
            dU = _dg(V, dpow, 1, 1)                  # (8, chunk)
            du3, du4, du5 = dU[3:4, :], dU[4:5, :], dU[5:6, :]
            d_a = -0.5 * dU[0:1, :] + mxl * du3 - 0.5 * mxl * mxl * du5
            d_c = -0.5 * dU[1:2, :] + myl * du4 - 0.5 * myl * myl * du5
            d_b = -dU[2:3, :] + myl * du3 + mxl * du4 - mxl * myl * du5
            d_mx = ca * du3 + cb * du4 - (ca * mxl + cb * myl) * du5
            d_my = cb * du3 + cc * du4 - (cc * myl + cb * mxl) * du5

            zeros = jnp.zeros((ATTR_DIM - 9, chunk), jnp.float32)
            obuf[slot] = jnp.concatenate(
                [d_mx, d_my, d_a, d_b, d_c, d_rgb, d_op, zeros], axis=0
            )
            return (
                t_run * jnp.exp(jnp.sum(lg, axis=0, keepdims=True)),
                pref[chunk - 1 : chunk, :],
            )

        def dead(_):
            obuf[slot] = jnp.zeros((ATTR_DIM, chunk), jnp.float32)
            return t_run, prefix

        new_carry = jax.lax.cond(alive, live, dead, None)
        odma(slot, j).start()
        return new_carry

    t0 = jnp.ones((1, npix), jnp.float32)
    p0 = jnp.zeros((1, npix), jnp.float32)
    jax.lax.fori_loop(0, nch, body, (t0, p0))

    # retire trailing write DMAs
    @pl.when(nch >= 1)
    def _():
        odma((nch - 1) % 2, nch - 1).wait()

    @pl.when(nch >= 2)
    def _():
        odma((nch - 2) % 2, nch - 2).wait()


def _fwd_call(attrs_t, tile_start, tile_chunks, *, num_tiles, tw, tile_size, chunk,
              interpret):
    npix = tile_size * tile_size
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 4, npix), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, ATTR_DIM, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, tw=tw, tile_size=tile_size, chunk=chunk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, 4, npix), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(tile_start, tile_chunks, attrs_t)


def _bwd_call(attrs_t, tile_start, tile_chunks, res, g, *, num_tiles, tw, tile_size,
              chunk, interpret):
    npix = tile_size * tile_size
    tile_block = pl.BlockSpec(
        (1, 4, npix), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            tile_block,
            tile_block,
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, ATTR_DIM, chunk), jnp.float32),
            pltpu.VMEM((2, ATTR_DIM, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, tw=tw, tile_size=tile_size, chunk=chunk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(attrs_t.shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(tile_start, tile_chunks, attrs_t, res, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def composite_tiles(attrs_t, tile_start, tile_chunks, static):
    """attrs_t (16, padded_budget): TRANSPOSED sorted+gathered pair attributes;
    tile_start/tile_chunks (num_tiles,) int32: per-tile chunk-aligned segment
    table. -> tiles (num_tiles, 4, npix): rgb accumulation + final transmittance.
    Tiles with zero pairs come out exactly (0,0,0,T=1).

    `static`: hashable tuple (num_tiles, tw, tile_size, chunk, interpret);
    chunk must be a multiple of 128 on hardware (DMA lane alignment).
    """
    num_tiles, tw, tile_size, chunk, interpret = static
    return _fwd_call(
        attrs_t, tile_start, tile_chunks,
        num_tiles=num_tiles, tw=tw, tile_size=tile_size, chunk=chunk,
        interpret=interpret,
    )


def _composite_fwd(attrs_t, tile_start, tile_chunks, static):
    out = composite_tiles(attrs_t, tile_start, tile_chunks, static)
    return out, (attrs_t, tile_start, tile_chunks, out)


def _composite_bwd(static, residuals, g):
    num_tiles, tw, tile_size, chunk, interpret = static
    attrs_t, tile_start, tile_chunks, out = residuals
    d_attrs_t = _bwd_call(
        attrs_t, tile_start, tile_chunks, out, g,
        num_tiles=num_tiles, tw=tw, tile_size=tile_size, chunk=chunk,
        interpret=interpret,
    )
    zero_i = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return d_attrs_t, zero_i(tile_start), zero_i(tile_chunks)


composite_tiles.defvjp(_composite_fwd, _composite_bwd)


def untile_image(tiles: jnp.ndarray, tw: int, th: int, tile_size: int,
                 width: int, height: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(num_tiles, 4, npix) -> (H, W, 3) rgb accum and (H, W) transmittance."""
    t = tiles.reshape(th, tw, 4, tile_size, tile_size)
    img = jnp.transpose(t, (2, 0, 3, 1, 4)).reshape(4, th * tile_size, tw * tile_size)
    img = img[:, :height, :width]
    return jnp.transpose(img[:3], (1, 2, 0)), img[3]
