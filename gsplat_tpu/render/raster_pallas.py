"""Pallas TPU tile-compositing kernels (forward + hand-written backward).

TPU-native replacement for upstream's CUDA `diff-gaussian-rasterization` tile loop
(the reference lacks it entirely; SURVEY.md §0, §7 M2/M3). Design:

- The kernel grid is the TILE GRID: one program per image tile. Each program
  streams its tile's sorted (Gaussian,tile) pair rows from HBM in chunk-sized
  blocks with double-buffered async DMA, composites front-to-back in VMEM, and
  early-exits the whole tile once transmittance saturates — upstream's
  per-pixel early-out applied at chunk granularity.
- COMPACT pair layout (round-2 redesign): tile segments in the sorted pair
  array are NOT chunk-aligned. Each program DMAs the chunk-aligned superset
  [align_down(start), align_up(start+count)) and masks rows outside its own
  segment (they belong to neighbor tiles; masking zeroes their alpha AND their
  gradients). This removes every pair-budget-sized padded-layout map from the
  XLA graph — ~120 ms/step of gathers and scatters at 1M Gaussians @1080p.
- Pair attributes live TRANSPOSED in HBM as (16, P): Mosaic requires DMA slices
  to be 128-lane-aligned in the minor dimension (chunk % 128 == 0 on hardware),
  and it puts per-pair rows on the full 128-lane VPU. Row 9 carries the pair's
  GAUSSIAN ID (int32 bits in an f32 row): the backward kernel copies it through
  (masked rows get KEY_INVALID) so every d-row carries its own segment-sort key
  and per-Gaussian gradient reduction outside is one `lax.sort` + cumsum-diff.
- The per-pair/per-pixel Gaussian evaluation runs in TILE-LOCAL pixel
  coordinates (local coords keep the f32 cancellation error ~1e-5; global
  1080p coordinates would lose ~3 digits) — by default as direct broadcast
  VPU FMAs (GSPLAT_POWER=vpu); the MXU bilinear form U(8,pair)^T @ V(8,pixel)
  with V = [px^2, py^2, px*py, px, py, 1] stays selectable. In-chunk
  front-to-back compositing is parallelized with an exclusive-transmittance
  prefix — by default a product scan over (1 - alpha) via log2(chunk) shifted
  VPU multiplies (GSPLAT_TRANS=prod); the log-space sum-scan forms (shifted
  adds, or lower-triangular matmuls on the MXU) remain selectable A/B levers.
- The backward kernel re-sweeps the same chunks front-to-back, reconstructing
  per-pair transmittance and the prefix of color-dot-cotangent sums;
  dL/d{mean2d, conic, rgb, opacity} per pair chains through dU = V @ dpower^T
  (MXU again) and is DMA'd to this tile's OWN chunk-aligned region of the
  d array (`out_start` table) — no two tiles write the same chunk, so there are
  NO write conflicts and no atomics (TPUs have none; SURVEY.md §7 hard part 1).

Attr row layout (16 rows x P pairs):
  0 mean_x | 1 mean_y | 2 conic_a | 3 conic_b | 4 conic_c | 5..7 rgb | 8 opacity |
  9 gid bits | 10..15 zero padding.
d-row layout (16 rows x P_out):
  0 d_mean_x | 1 d_mean_y | 2..4 d_conic | 5..7 d_rgb | 8 d_opacity |
  9 key bits (gid, or KEY_INVALID for masked rows) | 10..15 zero.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4
ATTR_DIM = 16
# The gid sort key rides attr/d row 9 as an ordinary f32 VALUE (exact for
# ids < 2^24). Storing raw int bits there instead would make small gids
# DENORMAL float patterns, which TPU float paths flush to zero — scrambling
# the gradient segment sort. KEY_INVALID sorts after every real id.
KEY_INVALID = float(1 << 30)


def pack_attrs(mean2d, conic, rgb, opacity) -> jnp.ndarray:
    """(N,2),(N,3),(N,3),(N,) -> (N,16) attribute rows (differentiable).
    Row 9 (gid bits) is filled by the gather in render.rasterize, not here."""
    n = mean2d.shape[0]
    pad = jnp.zeros((n, ATTR_DIM - 9), jnp.float32)
    return jnp.concatenate(
        [mean2d, conic, rgb, opacity[:, None], pad], axis=1
    ).astype(jnp.float32)


def _pixel_basis(tile_size: int):
    """V (8, npix): [px^2, py^2, px*py, px, py, 1, 0, 0] in CENTERED tile-local
    coords (px, py in [-tile/2, tile/2)). Centering makes every entry an
    integer <= (tile/2)^2 = 256 at tile 32 — EXACTLY representable in bf16,
    which is what lets split mode do 3 one-sided passes instead of HIGHEST's
    6 double-sided ones (and conditions the f32 bilinear form better)."""
    npix = tile_size * tile_size
    h = tile_size // 2
    pix = jax.lax.broadcasted_iota(jnp.int32, (1, npix), 1)
    px = (pix % tile_size - h).astype(jnp.float32)
    py = (pix // tile_size - h).astype(jnp.float32)
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
    return _dgx(a, e8, 0, 0, exact="b", terms=3)  # (chunk, 1)


def _rgb_columns(a):
    """rgb rows 5..7 of the attr block as (chunk, 3) columns (one-hot matmul
    transpose, same trick as _op_column)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (ATTR_DIM, 3), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (ATTR_DIM, 3), 1)
    sel = (r == c + 5).astype(jnp.float32)
    return _dgx(a, sel, 0, 0, exact="b", terms=3)  # (chunk, 3)


def _valid_column(j, head, count, chunk):
    """(chunk, 1) f32 mask: 1 for rows of THIS tile's segment, 0 for the masked
    head/tail rows of the aligned superset (neighbor tiles' pairs)."""
    idx = j * chunk + jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
    ok = (idx >= head) & (idx < head + count)
    return ok.astype(jnp.float32)


def _valid_row(j, head, count, chunk):
    """Same mask as _valid_column but (1, chunk) — lane-oriented, for masking
    the (1, chunk) key row without any in-kernel transpose."""
    idx = j * chunk + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    return (idx >= head) & (idx < head + count)


def _alphas_from_power(power, op_col):
    """Upstream alpha masking: skip power>0, clamp at 0.99, zero below 1/255;
    power (chunk, npix); op_col (chunk, 1) — pre-multiplied by the segment
    validity mask, so masked rows have op 0, raw 0, and therefore alpha 0 and
    grad-chain 0 without any per-(pair, pixel) mask multiply.

    power>0 is folded into the exponent (-100 -> exp underflows to exactly 0 on
    TPU's flush-to-zero path, and to <1e-43 < ALPHA_MIN/op elsewhere), so the
    skip tests collapse to one range check on raw — ~6 fewer VPU ops per
    (pair, pixel) than masking alpha with three predicates after the fact."""
    G = jnp.exp(jnp.where(power > 0.0, -100.0, power))
    raw = op_col * G  # broadcast (chunk,1) * (chunk,npix)
    keep = raw >= ALPHA_MIN
    alpha = jnp.where(keep, jnp.minimum(raw, ALPHA_MAX), 0.0)
    chain = (keep & (raw <= ALPHA_MAX)).astype(jnp.float32)
    return alpha, chain, G


# TPU matmuls default to bf16 INPUT precision (preferred_element_type only
# sets the accumulator), and bf16 truncation of the bilinear coefficients /
# log-transmittance terms is enough to destabilize training (observed: loss
# divergence after ~400 iters on v5e while the f32 CPU path converged).
# HIGHEST = 6-pass bf16 synthesis (~2^-24 input error); Mosaic's dot lowering
# supports only DEFAULT and HIGHEST (Precision.HIGH raises NotImplementedError
# as of jax 0.9).
#
# "split" (the DEFAULT; round-2 lever): the kernels are MXU-PASS-bound, not
# VPU-bound — measured on v5e sparse bench: HIGHEST 252 ms/step vs DEFAULT
# (1-pass) 178 ms, i.e. ~75 ms of pure pass synthesis. Most matmuls here have
# ONE side EXACTLY representable in bf16 — the pixel basis V (integers <=
# (tile/2)^2 = 256 in centered tile-local coordinates), the 0/1 triangular
# cumsum matrices, one-hot selectors, the ones row. XLA's HIGHEST cannot know
# that and splits BOTH operands (6 cross-term passes); splitting only the
# data operand into SPLIT_TERMS=3 bf16 terms reaches the same ~2^-24
# input-error class in 3 passes (_dgx). The k=3 color-dot moves to VPU
# broadcast-FMA entirely (exact f32). Matmuls with NO exact side (rgb@w image
# accumulation, d_rgb) stay HIGHEST, as do the V matmuls at tile_size > 32
# (where (tile/2)^2 > 256 overflows bf16's exact-integer range — exact_ok).
import os as _os

_PRECISION_MODE = _os.environ.get("GSPLAT_MATMUL_PRECISION", "split")
# SPLIT_TERMS=2 (round-4 default flip): 2-term bf16 splits reach ~2^-16
# input error — one MXU pass fewer per _dgx than the round-2 3-term form.
# A/B on the v5e sparse kept profile (with DG_COMP=1): 183.9 -> 174.1 ms
# synced, 162.8 -> 147.8 pipelined. Quality-validated over the FULL 30k
# upstream schedule by artifacts/qproxy_sat30/ (round 5; test PSNR
# 38.65/32.82/31.11/38.05 at 1k/7k/15k/30k vs the r3-defaults artifact's
# 38.65/32.75/31.23/38.15 — every milestone within run noise), plus the
# 1k control artifacts/qproxy_ctrl/ matching the r3 loss trajectory to 4
# decimals.
SPLIT_TERMS = int(_os.environ.get("GSPLAT_SPLIT_TERMS", "2"))
# All precision/shape knobs freeze at IMPORT (like _PRECISION_MODE): jit caches
# do not key on env vars, so a post-trace toggle would silently do nothing.
# DG_COMP defaults ON since round 4 (part of the same A/B + 30k quality
# validation as SPLIT_TERMS above); GSPLAT_DG_COMP=0 restores HIGHEST.
_DG_COMP = _os.environ.get("GSPLAT_DG_COMP", "1") == "1"
_CUMSUM_SUB = int(_os.environ.get("GSPLAT_CUMSUM_SUB", "32"))
if _CUMSUM_SUB < 1:
    raise ValueError(f"GSPLAT_CUMSUM_SUB must be >= 1, got {_CUMSUM_SUB}")
# Round-4 kernel levers (defaults = measured winners on v5e):
# GSPLAT_POWER=vpu evaluates the per-(pair,pixel) quadratic with broadcast
# VPU FMAs in exact f32 (vs the 3-pass split-bf16 MXU bilinear form) — the
# k=8 contraction underutilizes the 128-deep MXU, and the direct form needs
# ~8 cheap vector ops/cell. GSPLAT_CUMSUM=roll computes the in-chunk prefix
# with log2(chunk) shifted adds on the VPU instead of the triangular
# matmuls. A/B on the sparse bench profile (same session, device-side):
# base 171.2 ms (bwd kernel 52.9, fwd 27.6) -> roll 163.8 (47.6/25.5) ->
# roll+vpu 161.8 (45.3/25.8). Both are exact-f32 forms (parity vs the MXU
# path <= 2e-6 rel on image and all grads); mxu/tri remain selectable for
# re-measurement on other TPU generations.
_POWER_MODE = _os.environ.get("GSPLAT_POWER", "vpu")
_CUMSUM_MODE = _os.environ.get("GSPLAT_CUMSUM", "roll")
# GSPLAT_TRANS=prod: the in-chunk exclusive transmittance as a direct
# PRODUCT scan over (1 - alpha) — log2(chunk) shifted VPU multiplies — instead
# of the log-space form (log1p -> sum scan -> exp), which pays 2 transcendental
# evaluations per (pair, pixel) cell. The log form existed because the
# triangular-MATMUL scan can only sum; the roll scan shifts, so it multiplies
# just as happily. Product-chain f32 error (~chunk ulps worst case) is the
# same class as the log/exp round trip, and underflow-to-zero equals the
# saturated-transmittance regime by construction. "log" remains selectable
# for A/B on other TPU generations.
_TRANS_MODE = _os.environ.get("GSPLAT_TRANS", "prod")
assert _POWER_MODE in ("mxu", "vpu"), _POWER_MODE
assert _CUMSUM_MODE in ("tri", "roll"), _CUMSUM_MODE
assert _TRANS_MODE in ("log", "prod"), _TRANS_MODE
# GSPLAT_PACK sets the DEFAULT of render(attr_pack=...): the per-pair
# attribute table rides as 8 columns — rgb + opacity packed into two bf16-pair
# f32 columns — instead of 16. The budget-long P-row gather prices by row
# width in tiers (microbench, BASELINE.md round 4: <=8 cols 8.96 ms,
# 9-16 cols 12.36 at 1.9M rows), so the 7-column gather + appended gid column
# lands in the cheap tier, and the kernels' attr DMA bytes halve. Cost: rgb
# and opacity quantize to bf16 (~2^-9 rel) in BOTH the image and the gradient
# chain (the master f32 parameters are untouched — standard low-precision-
# activation semantics). attr_pack is a real parameter (not a frozen env
# read) so tests A/B it in-process.
#
# Default OFF (round-4 final): the A/B win is real (183.9 -> 179.6 ms synced,
# 162.8 -> 151.5 pipelined on the sparse kept profile) but the QUALITY gate
# failed — the quality-proxy schedule with pack+SPLIT_TERMS=2+DG_COMP all on
# measured test PSNR 33.87 @1k vs 38.63 at the r3 defaults (4.8 dB down).
# Pack is the implicated lever (the only one touching forward VALUES, at
# ~2^-9 vs the others' 2^-17/2^-18 on gradients; the split2+dgcomp-only
# rerun is the control — see BASELINE.md round-4 notes). Packed stays a
# supported opt-in (GSPLAT_PACK=1, or "auto" = on-TPU-only) for
# inference/serving paths where the table is read-only.
_PACK_ENV = _os.environ.get("GSPLAT_PACK", "0")
_PACK_DEFAULT = None if _PACK_ENV == "auto" else _PACK_ENV == "1"
PACKED_IN_DIM = 8
# packed input row layout (8 rows x P):
#   0 mean_x | 1 mean_y | 2 conic_a | 3 conic_b | 4 conic_c |
#   5 rg bf16-pair | 6 b/op bf16-pair | 7 gid (f32 value)
_PACKED_GID_ROW = 7


def _pack_pair_cols(hi, lo):
    """Two f32 columns -> one f32 column holding (bf16(hi) << 16) | bf16(lo)."""
    h = jax.lax.bitcast_convert_type(
        hi.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    l = jax.lax.bitcast_convert_type(
        lo.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    return jax.lax.bitcast_convert_type((h << 16) | l, jnp.float32)


def _unpack_hi(x):
    """f32 -> the bf16 stored in its upper 16 bits, as f32 (bf16 is truncated
    f32, so masking the low half IS the value)."""
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    return jax.lax.bitcast_convert_type(
        u & jnp.uint32(0xFFFF0000), jnp.float32)


def _unpack_lo(x):
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    return jax.lax.bitcast_convert_type(u << 16, jnp.float32)


def pack_attrs8(attrs: jnp.ndarray) -> jnp.ndarray:
    """(N, 16) f32 attr rows -> (N, 7) packed columns (layout above, sans gid).
    bf16-quantizes rgb (cols 5..7) and opacity (col 8); geometry stays f32."""
    rg = _pack_pair_cols(attrs[:, 5], attrs[:, 6])
    bo = _pack_pair_cols(attrs[:, 7], attrs[:, 8])
    return jnp.concatenate(
        [attrs[:, :5], rg[:, None], bo[:, None]], axis=1)


def _unpack_rgbop(a):
    """Packed (8, chunk) attr block -> (rgb (3, chunk), opacity (1, chunk))."""
    rg = a[5:6, :]
    bo = a[6:7, :]
    rgb = jnp.concatenate(
        [_unpack_hi(rg), _unpack_lo(rg), _unpack_hi(bo)], axis=0)
    return rgb, _unpack_lo(bo)


def _matmul_precision():
    return {
        "highest": jax.lax.Precision.HIGHEST,
        "default": jax.lax.Precision.DEFAULT,
        "split": jax.lax.Precision.HIGHEST,  # for non-split-safe matmuls
    }[_PRECISION_MODE]


def _dg(a, b, ca, cb, comp_ok: bool = False):
    """dot_general contracting axis ca of a with axis cb of b (f32 accum,
    input precision per the mode — see note above). In split mode this is the
    fallback for matmuls with NO bf16-exact operand (rgb@w, d_rgb).

    GSPLAT_DG_COMP=1 (the round-4 default): replace HIGHEST's 6-pass
    synthesis with a compensated product — a_hi(bf16) against the
    SPLIT_TERMS-term bf16 expansion of b, plus one 1-pass correction
    (a - a_hi) @ b.
    Input-error class ~2^-18 (vs ~2^-24): the residual a_lo*b_err cross term
    is bounded by |a| 2^-9 * |b| 2^-9. Only sanctioned for the image/d_rgb
    accumulations whose operands are O(1) weights, which pass comp_ok=True;
    every other callsite (notably the _dgx exact_ok=False fallback, whose
    pixel-basis operands are large at tile_size > 32) stays HIGHEST even with
    the flag on. Quality evidence: the artifacts/qproxy_ctrl 1k control run
    (split2+dgcomp) matches the r3-defaults trajectory to 4 decimals; bf16
    1-pass (no compensation) was observed to diverge. GSPLAT_DG_COMP=0
    restores HIGHEST."""
    if _PRECISION_MODE == "split" and _DG_COMP and comp_ok:
        a_hi = a.astype(jnp.bfloat16)
        out = None
        for h in _split_terms(b, SPLIT_TERMS):
            d = _dg_1pass(a_hi, h, ca, cb)
            out = d if out is None else out + d
        return out + _dg_1pass(a - a_hi.astype(jnp.float32), b, ca, cb)
    return jax.lax.dot_general(
        a, b, (((ca,), (cb,)), ((), ())), preferred_element_type=jnp.float32,
        precision=_matmul_precision(),
    )


def _split_terms(a, terms: int):
    """f32 -> `terms` bf16 arrays summing to a (error ~2^-(8*terms) rel)."""
    out = []
    rem = a
    for t in range(terms):
        h = rem.astype(jnp.bfloat16)
        out.append(h)
        if t + 1 < terms:
            rem = rem - h.astype(jnp.float32)
    return out


def _dg_1pass(a, b, ca, cb):
    return jax.lax.dot_general(
        a, b, (((ca,), (cb,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


def _dgx(a, b, ca, cb, exact: str, exact_ok: bool = True, terms: int = 0):
    """dot_general where the operand named by `exact` ("a"/"b") is EXACTLY
    representable in bf16 (pixel basis, 0/1 triangular, one-hot selector,
    ones row). In split mode: 1-pass matmuls on the other operand's bf16
    expansion (3 terms cover the full 24-bit f32 mantissa — HIGHEST's class
    at half the passes; the round-4 SPLIT_TERMS=2 default is ~2^-17 on the
    heavy per-cell matmuls). Other modes — or exact_ok=False (pixel basis at
    tile_size > 32, where (tile/2)^2 > 256 overflows bf16's integer range) —
    plain _dg.

    terms=3 pins a callsite at the exact 3-term split regardless of
    SPLIT_TERMS: the one-hot TRANSPOSES (_op_column/_rgb_columns/_cols6*)
    move attribute VALUES, and a 2-term transpose perturbs opacity at ~2^-17,
    flipping raw >= 1/255 alpha-threshold decisions vs the oracle (observed
    as ~3e-3 single-pixel diffs). Their k is tiny, so the extra pass is
    free; only the per-cell dU/d_op matmuls ride the 2-term default."""
    if _PRECISION_MODE != "split" or not exact_ok:
        return _dg(a, b, ca, cb)
    n_terms = terms or SPLIT_TERMS
    if exact == "a":
        aa = a.astype(jnp.bfloat16)
        out = None
        for h in _split_terms(b, n_terms):
            d = _dg_1pass(aa, h, ca, cb)
            out = d if out is None else out + d
        return out
    bb = b.astype(jnp.bfloat16)
    out = None
    for h in _split_terms(a, n_terms):
        d = _dg_1pass(h, bb, ca, cb)
        out = d if out is None else out + d
    return out


def _mm(a, b):
    # image accumulation rgb@w — the one fwd callsite sanctioned for DG_COMP
    return _dg(a, b, 1, 0, comp_ok=True)


def _cols6(a):
    """(16, chunk) attr block -> (chunk, 8) columns [mx,my,ca,cb,cc,op,·,·]
    via ONE one-hot matmul transpose (cols 6,7 land on rgb rows and are
    ignored). Used by the VPU power mode, replacing _op_column + the U rows."""
    r = jax.lax.broadcasted_iota(jnp.int32, (ATTR_DIM, 8), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (ATTR_DIM, 8), 1)
    tgt = c + (c == 5).astype(jnp.int32) * 3  # 0,1,2,3,4 -> same; 5 -> row 8
    sel = (r == tgt).astype(jnp.float32)
    return _dgx(a, sel, 0, 0, exact="b", terms=3)


def _cols6p(a, op_row):
    """Packed-layout _cols6: geometry rows 0..4 of the (8, chunk) block plus
    the UNPACKED opacity row -> (chunk, 8) [mx,my,ca,cb,cc,op,·,·] via one
    identity-matmul transpose."""
    blk = jnp.concatenate(
        [a[0:5, :], op_row, jnp.zeros((2, a.shape[1]), jnp.float32)], axis=0
    )
    r = jax.lax.broadcasted_iota(jnp.int32, (8, 8), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (8, 8), 1)
    sel = (r == c).astype(jnp.float32)
    return _dgx(blk, sel, 0, 0, exact="b", terms=3)


def _rgb_columns_p(rgb_rows):
    """(3, chunk) unpacked rgb rows -> (chunk, 3) columns (identity-matmul
    transpose, packed-layout counterpart of _rgb_columns)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (3, 3), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (3, 3), 1)
    sel = (r == c).astype(jnp.float32)
    return _dgx(rgb_rows, sel, 0, 0, exact="b", terms=3)


def _power_vpu(cols, V, ox, oy):
    """power(pair,pixel) = -(0.5*ca*dx^2 + cb*dx*dy + 0.5*cc*dy^2) with
    dx = px - (mx - ox), evaluated directly with broadcast VPU FMAs in exact
    f32 (no bf16 splits). cols from _cols6; V rows 3/4 carry px/py."""
    dx = V[3:4, :] - (cols[:, 0:1] - ox)   # (chunk, npix)
    dy = V[4:5, :] - (cols[:, 1:2] - oy)
    return -(
        (0.5 * cols[:, 2:3]) * (dx * dx)
        + cols[:, 3:4] * (dx * dy)
        + (0.5 * cols[:, 4:5]) * (dy * dy)
    )


def _tri(c: int, dtype) -> jnp.ndarray:
    row = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    return (row >= col).astype(dtype)


def _cumsum0(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumsum along axis 0 as lower-triangular matmuls (MXU; Mosaic has
    no cumsum lowering). The 0/1 triangular matrix is bf16-exact, so split mode
    runs these at SPLIT_TERMS passes.

    Block width: under a MAC model, 32-row triangular blocks + a sequential
    carry cost 4x less than one 128-wide tri (the tri matmul does
    O(block * pixels) useful work per pair). The MXU-pass counter-model (the
    round-2.5 HIGHEST/split/DEFAULT A/B = 252/215/178 ms was ~linear in
    synthesis passes) predicts the opposite — one k=128 tri issues 4x fewer
    passes than four k=32 blocks. MEASURED on the v5e sparse bench, same
    session as a 221.0 ms baseline: sub=128 -> 224.4 ms, i.e. a wash/slight
    regression — short-k matmuls evidently pipeline well enough that the MAC
    model wins for triangular blocks (unlike bf16 synthesis passes, which
    re-stream full-k operands). sub=32 stays the default; env-tunable for
    re-measurement on other TPU generations.

    GSPLAT_CUMSUM=roll: log2(c) shifted adds on the VPU instead (exact f32,
    ~14 cheap vector ops/cell) — the round-4 A/B lever against the MXU
    triangular form."""
    c = x.shape[0]
    if _CUMSUM_MODE == "roll":
        k = 1
        while k < c:
            x = x + jnp.concatenate(
                [jnp.zeros((k, x.shape[1]), x.dtype), x[:-k, :]], axis=0
            )
            k *= 2
        return x
    sub = _CUMSUM_SUB
    if c <= sub or c % sub != 0:
        return _dgx(_tri(c, x.dtype), x, 1, 0, exact="a")
    tri = _tri(sub, x.dtype)
    blocks = []
    carry = jnp.zeros((1, x.shape[1]), x.dtype)
    for i in range(c // sub):
        blk = _dgx(tri, x[i * sub:(i + 1) * sub, :], 1, 0, exact="a") + carry
        blocks.append(blk)
        carry = blk[sub - 1:sub, :]
    return jnp.concatenate(blocks, axis=0)


def _cumprod0_excl(x: jnp.ndarray):
    """(c, npix) -> (exclusive product scan along axis 0, total product).
    Shift-in-ones then log2(c) shifted multiplies (the roll scan, but
    multiplicative — see _TRANS_MODE). Returns the per-row EXCLUSIVE prefix
    product (row i = prod of rows < i) and the (1, npix) total product."""
    c = x.shape[0]
    total_in = x[c - 1:c, :]
    # exclusive scan = inclusive scan of [1, x_0, ..., x_{c-2}]
    x = jnp.concatenate([jnp.ones((1, x.shape[1]), x.dtype), x[:-1, :]], axis=0)
    k = 1
    while k < c:
        x = x * jnp.concatenate(
            [jnp.ones((k, x.shape[1]), x.dtype), x[:-k, :]], axis=0
        )
        k *= 2
    return x, x[c - 1:c, :] * total_in


def _trans_prefix(alpha):
    """alpha (chunk, npix) -> (t_exc exclusive transmittance within the chunk,
    chunk_total transmittance factor), by _TRANS_MODE (see module note)."""
    if _TRANS_MODE == "prod":
        return _cumprod0_excl(1.0 - alpha)
    lg = jnp.log1p(-alpha)
    cum = _cumsum0(lg)
    return jnp.exp(cum - lg), jnp.exp(jnp.sum(lg, axis=0, keepdims=True))


def _seg(ts_ref, tc_ref, i, chunk):
    """Per-tile segment -> (aligned DMA base, head offset, count, chunk count)."""
    s = ts_ref[i]
    c = tc_ref[i]
    astart = pl.multiple_of((s // chunk) * chunk, chunk)
    head = s - astart
    nch = (head + c + chunk - 1) // chunk
    return astart, head, c, nch


def _fwd_kernel(
    ts_ref, tc_ref, attrs_hbm, out_ref, nproc_ref, buf, sems,
    *, tw: int, tile_size: int, chunk: int, pack: bool,
):
    npix = tile_size * tile_size
    i = pl.program_id(0)
    astart, head, count, nch = _seg(ts_ref, tc_ref, i, chunk)
    # tile origin shifted to the CENTER of the tile (matches _pixel_basis)
    h = tile_size // 2
    ox = ((i % tw) * tile_size + h).astype(jnp.float32)
    oy = ((i // tw) * tile_size + h).astype(jnp.float32)
    V = _pixel_basis(tile_size)

    def dma(slot, j):
        return pltpu.make_async_copy(
            attrs_hbm.at[:, pl.ds(astart + j * chunk, chunk)], buf.at[slot], sems.at[slot]
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
        a = buf[slot]                     # (in_dim, chunk)
        if pack:
            # packed layout forces the VPU power path (the MXU bilinear-form
            # coefficients read opacity at classic row 8)
            rgb_rows, op_row = _unpack_rgbop(a)
            cols = _cols6p(a, op_row)
            power = _power_vpu(cols, V, ox, oy)
            op_v = cols[:, 5:6] * _valid_column(j, head, count, chunk)
        elif _POWER_MODE == "vpu":
            rgb_rows = a[5:8, :]
            cols = _cols6(a)
            power = _power_vpu(cols, V, ox, oy)
            op_v = cols[:, 5:6] * _valid_column(j, head, count, chunk)
        else:
            rgb_rows = a[5:8, :]
            U, _, _, _, _, _, _ = _chunk_U(a, ox, oy)
            power = _dgx(U, V, 0, 0, exact="b", exact_ok=tile_size <= 32)
            op_v = _op_column(a) * _valid_column(j, head, count, chunk)
        alpha, _, _ = _alphas_from_power(power, op_v)

        t_exc, t_chunk = _trans_prefix(alpha)
        w = alpha * t_exc * T             # (chunk, npix)
        acc = acc + _mm(rgb_rows, w)      # rgb (3,chunk) @ w -> (3, npix)
        T = T * t_chunk
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
    # chunks actually composited before saturation: the backward pass writes
    # d-rows ONLY for these (pairs past saturation get exactly zero gradient
    # under the truncated-forward semantics), so the gradient sort and
    # reduction run over the COMPACTED d-array instead of every kept pair —
    # on dense scenes ~90% of chunks sit behind saturation (the round-2
    # profile's 296 ms 10-operand grad sort priced all of them).
    nproc_ref[i] = j_end


def _bwd_kernel(
    ts_ref, tc_ref, cs_ref, np_ref, attrs_hbm, res_ref, g_ref, d_init_hbm,
    d_hbm, ibuf, obuf, isems, osems, *, tw: int, tile_size: int, chunk: int,
    pack: bool,
):
    # d_init_hbm is aliased to d_hbm (input_output_aliases): the caller
    # pre-fills d with zeros + KEY_INVALID keys so the rows no tile writes
    # (the compacted-region tail past the last processed chunk) hold inert
    # keys instead of UNINITIALIZED HBM — on hardware, garbage bytes there can
    # alias real Gaussian ids and corrupt the sort-reduction (interpret mode
    # zero-fills buffers, so CPU parity cannot catch this).
    #
    # cs_ref/np_ref (saturation compaction, round 3): the forward kernel
    # reports how many chunks each tile composited before transmittance
    # saturation (nproc); the caller cumsums those into per-tile COMPACTED
    # output offsets. This kernel sweeps exactly nproc chunks — pairs behind
    # saturation receive exactly zero gradient under the truncated-forward
    # semantics, so their d-rows (and the old key-only tail loop that used to
    # emit them for the gauss_cum boundary table) are simply absent; the
    # reduction derives per-Gaussian boundaries from the sorted keys instead.
    del d_init_hbm
    npix = tile_size * tile_size
    i = pl.program_id(0)
    astart, head, count, nch = _seg(ts_ref, tc_ref, i, chunk)
    del nch
    nproc = np_ref[i]
    ostart = pl.multiple_of(cs_ref[i], chunk)
    h = tile_size // 2
    ox = ((i % tw) * tile_size + h).astype(jnp.float32)
    oy = ((i // tw) * tile_size + h).astype(jnp.float32)
    V = _pixel_basis(tile_size)
    ones_pix = jnp.ones((1, npix), jnp.float32)

    g_rgb = g_ref[0, :3, :]          # (3, npix) cotangent of the rgb accumulation
    g_t = g_ref[0, 3:4, :]           # (1, npix) cotangent of final transmittance
    res_rgb = res_ref[0, :3, :]
    t_final = res_ref[0, 3:4, :]
    total_cg = jnp.sum(res_rgb * g_rgb, axis=0, keepdims=True)  # (1, npix)

    def idma(slot, j):
        return pltpu.make_async_copy(
            attrs_hbm.at[:, pl.ds(astart + j * chunk, chunk)], ibuf.at[slot],
            isems.at[slot],
        )

    def odma(slot, j):
        return pltpu.make_async_copy(
            obuf.at[slot], d_hbm.at[:, pl.ds(ostart + j * chunk, chunk)], osems.at[slot]
        )

    @pl.when(nproc > 0)
    def _():
        idma(0, 0).start()

    def body(j, state):
        t_run, prefix = state
        slot = j % 2

        @pl.when(j + 1 < nproc)
        def _():
            idma((j + 1) % 2, j + 1).start()

        idma(slot, j).wait()
        # the write DMA that used this output slot two chunks ago must be done
        @pl.when(j >= 2)
        def _():
            odma(slot, j - 2).wait()

        a = ibuf[slot]
        gid_row = _PACKED_GID_ROW if pack else 9
        key_row = jnp.where(
            _valid_row(j, head, count, chunk), a[gid_row:gid_row + 1, :],
            KEY_INVALID,
        )  # (1, chunk) f32 gid values

        mxl = a[0:1, :] - ox
        myl = a[1:2, :] - oy
        ca, cb, cc = a[2:3, :], a[3:4, :], a[4:5, :]
        if pack:
            rgb, op_row = _unpack_rgbop(a)
            cols = _cols6p(a, op_row)
            power = _power_vpu(cols, V, ox, oy)
            op_col = cols[:, 5:6] * _valid_column(j, head, count, chunk)
        elif _POWER_MODE == "vpu":
            rgb = a[5:8, :]
            cols = _cols6(a)
            power = _power_vpu(cols, V, ox, oy)
            op_col = cols[:, 5:6] * _valid_column(j, head, count, chunk)
        else:
            rgb = a[5:8, :]
            U = _chunk_U(a, ox, oy)[0]
            op_col = _op_column(a) * _valid_column(j, head, count, chunk)
            power = _dgx(U, V, 0, 0, exact="b", exact_ok=tile_size <= 32)
        alpha, chain, G = _alphas_from_power(power, op_col)

        t_exc, t_chunk = _trans_prefix(alpha)
        t_i = t_exc * t_run
        w = alpha * t_i

        if _PRECISION_MODE == "split":
            # k=3 color-dot off the MXU entirely: 3 exact-f32 broadcast FMAs
            # on the VPU (a k=3 matmul occupies a full 128-deep MXU pass; at
            # HIGHEST it was 6)
            rgb_c = _rgb_columns_p(rgb) if pack else _rgb_columns(a)  # (chunk, 3)
            cg = (
                rgb_c[:, 0:1] * g_rgb[0:1, :]
                + rgb_c[:, 1:2] * g_rgb[1:2, :]
                + rgb_c[:, 2:3] * g_rgb[2:3, :]
            )                                    # (chunk, npix)
        else:
            cg = _dg(rgb, g_rgb, 0, 0)           # (chunk, npix)
        wcg = w * cg
        pref = _cumsum0(wcg) + prefix
        # exact reciprocal beats the hardware divide on the VPU; alpha is
        # clamped <= 0.99 so 1-alpha >= 0.01 and the reciprocal is benign
        dalpha = t_i * cg - (total_cg - pref + t_final * g_t) * pl.reciprocal(
            1.0 - alpha, approx=False
        )
        dalpha = dalpha * chain
        d_rgb = _dg(g_rgb, w, 1, 1, comp_ok=True)  # (3, chunk)
        gda = G * dalpha
        d_op = _dgx(ones_pix, gda, 1, 1, exact="a")  # (1, chunk)
        dpow = op_col * gda                      # (chunk, npix)
        dU = _dgx(V, dpow, 1, 1, exact="a", exact_ok=tile_size <= 32)  # (8, chunk)
        du3, du4, du5 = dU[3:4, :], dU[4:5, :], dU[5:6, :]
        d_a = -0.5 * dU[0:1, :] + mxl * du3 - 0.5 * mxl * mxl * du5
        d_c = -0.5 * dU[1:2, :] + myl * du4 - 0.5 * myl * myl * du5
        d_b = -dU[2:3, :] + myl * du3 + mxl * du4 - mxl * myl * du5
        d_mx = ca * du3 + cb * du4 - (ca * mxl + cb * myl) * du5
        d_my = cb * du3 + cc * du4 - (cc * myl + cb * mxl) * du5

        zeros = jnp.zeros((ATTR_DIM - 10, chunk), jnp.float32)
        obuf[slot] = jnp.concatenate(
            [d_mx, d_my, d_a, d_b, d_c, d_rgb, d_op, key_row, zeros], axis=0
        )
        odma(slot, j).start()
        return (
            t_run * t_chunk,
            pref[chunk - 1 : chunk, :],
        )

    t0 = jnp.ones((1, npix), jnp.float32)
    p0 = jnp.zeros((1, npix), jnp.float32)
    jax.lax.fori_loop(0, nproc, body, (t0, p0))

    # retire trailing write DMAs
    @pl.when(nproc >= 1)
    def _():
        odma((nproc - 1) % 2, nproc - 1).wait()

    @pl.when(nproc >= 2)
    def _():
        odma((nproc - 2) % 2, nproc - 2).wait()


def _fwd_call(attrs_t, tile_start, tile_count, *, num_tiles, tw,
              tile_size, chunk, interpret):
    npix = tile_size * tile_size
    pack = attrs_t.shape[0] == PACKED_IN_DIM
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec(
                (1, 4, npix), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            # whole-array SMEM (rank-1 sub-128 blocks don't lower on Mosaic);
            # each grid step writes its own slot: num_tiles*4B <= 32 KB
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, attrs_t.shape[0], chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, tw=tw, tile_size=tile_size, chunk=chunk,
                          pack=pack),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((num_tiles, 4, npix), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles,), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(tile_start, tile_count, attrs_t)


def _bwd_call(attrs_t, tile_start, tile_count, comp_start, nproc, res, g, *,
              num_tiles, tw, tile_size, chunk, p_out, interpret):
    npix = tile_size * tile_size
    pack = attrs_t.shape[0] == PACKED_IN_DIM
    tile_block = pl.BlockSpec(
        (1, 4, npix), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            tile_block,
            tile_block,
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, attrs_t.shape[0], chunk), jnp.float32),
            pltpu.VMEM((2, ATTR_DIM, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    # inert fill: d rows zero, key row KEY_INVALID (see _bwd_kernel note).
    # One fused iota-select generator: a concatenate here materializes through
    # XLA layout copies (~16 ms of pure re-layout on a 1.7 GB buffer at 42M
    # pairs, seen as s32[2,8,...] copy pairs in the dense profile).
    d_init = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (ATTR_DIM, p_out), 0) == 9,
        KEY_INVALID, 0.0,
    ).astype(jnp.float32)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, tw=tw, tile_size=tile_size, chunk=chunk,
                          pack=pack),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ATTR_DIM, p_out), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        # operand index counts the 4 scalar-prefetch args: d_init is operand 7
        input_output_aliases={7: 0},
        interpret=interpret,
    )(tile_start, tile_count, comp_start, nproc, attrs_t, res, g, d_init)


def composite_fwd(attrs_t, tile_start, tile_count, *, num_tiles, tw,
                  tile_size, chunk, interpret):
    """Forward tile compositing over the COMPACT sorted pair layout.
    attrs_t (16, pair_budget); per-tile tables (num_tiles,) int32.
    -> (tiles, nproc): tiles (num_tiles, 4, npix) rgb accumulation + final
    transmittance; nproc (num_tiles,) int32 chunks composited before the
    saturation early-exit (the backward pass sweeps exactly these).
    Tiles with zero pairs come out exactly (0,0,0,T=1, nproc=0)."""
    return _fwd_call(
        attrs_t, tile_start, tile_count,
        num_tiles=num_tiles, tw=tw, tile_size=tile_size, chunk=chunk,
        interpret=interpret,
    )


def composite_bwd(attrs_t, tile_start, tile_count, comp_start, nproc, res, g,
                  *, num_tiles, tw, tile_size, chunk, p_out, interpret):
    """Backward sweep -> (16, p_out) d-rows COMPACTED into per-tile regions
    [comp_start[t], comp_start[t] + nproc[t]*chunk); row 9 carries each row's
    Gaussian-id key (KEY_INVALID on masked rows and the unwritten tail)."""
    return _bwd_call(
        attrs_t, tile_start, tile_count, comp_start, nproc, res, g,
        num_tiles=num_tiles, tw=tw, tile_size=tile_size, chunk=chunk,
        p_out=p_out, interpret=interpret,
    )


def untile_image(tiles: jnp.ndarray, tw: int, th: int, tile_size: int,
                 width: int, height: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(num_tiles, 4, npix) -> (H, W, 3) rgb accum and (H, W) transmittance."""
    t = tiles.reshape(th, tw, 4, tile_size, tile_size)
    img = jnp.transpose(t, (2, 0, 3, 1, 4)).reshape(4, th * tile_size, tw * tile_size)
    img = img[:, :height, :width]
    return jnp.transpose(img[:3], (1, 2, 0)), img[3]
