"""Pallas prefix-sum over the pair axis (TPU sequential-grid scan).

XLA lowers a pair-budget-long `jnp.cumsum` as O(log n) full passes over the
array (~9 ms per 42M-element i32 column on v5e; the 10-column variant cost
58 ms/step in round 2). This kernel makes every pair-long scan one pass at
HBM bandwidth: a sequential grid walks (BLOCK_ROWS, 128) blocks, computes the
in-block prefix on the MXU (two triangular matmuls), and carries the running
total across blocks in SMEM scratch.

Exactness: inputs are restricted to SMALL non-negative int32 values
(<= 255), so every in-block partial sum is <= 255 * BLOCK_ROWS * 128 =
16,711,680 < 2^24, exactly representable in f32; the running carry is added
in int32. The result equals jnp.cumsum bit-for-bit. Current call site: the
saturation bound cull's pair-long cumsum of 6-bit alpha quanta
(binning.bin_gaussians; XLA's decomposition of the same cumsum cost ~5 ms at
the dense bench's 26M kept pairs). The round-3 design also used it for the
expansion's gid_c map, until the pair->row resolution moved into the
expansion kernel itself (expand_pallas binary search).

No counterpart exists in the reference (its rasterizer data path is absent,
SURVEY.md §1 L2.5); upstream CUDA 3DGS uses cub::DeviceScan for the same role.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_ROWS = 512  # pairs per grid step = BLOCK_ROWS * 128


def _scan_kernel(x_ref, out_ref, carry_ref, *, bias, clip_hi, n_rows):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        carry_ref[0, 0] = 0

    x = x_ref[:].astype(jnp.float32)  # (BLOCK_ROWS, 128), values <= 255
    rows_done = b * BLOCK_ROWS
    if n_rows % BLOCK_ROWS != 0:
        # zero rows past the logical end so the carry stays exact
        ri = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        x = jnp.where(ri + rows_done < n_rows, x, 0.0)

    # in-block inclusive prefix: lane prefix via a (128,128) triangular
    # matmul, then row offsets via a strict-lower-triangular matmul over the
    # row totals. Inputs are <= 255, so per-lane row sums reach 255*128 =
    # 32640 and block partials 255*512*128 < 2^24 — exact in f32.
    li = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    lj = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    tri = (li <= lj).astype(jnp.float32)                     # inclusive
    lane_pre = jnp.dot(x, tri, preferred_element_type=jnp.float32)

    totals = lane_pre[:, 127:128]                            # (BLOCK_ROWS, 1)
    ri_ = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_ROWS, BLOCK_ROWS), 0)
    rj_ = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_ROWS, BLOCK_ROWS), 1)
    tri_strict = (rj_ < ri_).astype(jnp.float32)             # exclusive
    row_off = jnp.dot(tri_strict, totals, preferred_element_type=jnp.float32)

    block_pre = (lane_pre + row_off).astype(jnp.int32)       # exact
    carry = carry_ref[0, 0]
    out = block_pre + carry + bias
    if clip_hi is not None:
        out = jnp.clip(out, 0, clip_hi)
    out_ref[:] = out
    carry_ref[0, 0] = carry + block_pre[BLOCK_ROWS - 1, 127]


def prefix_sum_small(
    x: jnp.ndarray,
    *,
    bias: int = 0,
    clip_hi=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Inclusive prefix sum (+bias, optional clip to [0, clip_hi]) of a 1-D
    int32 array of SMALL non-negative values (<= 255; see module note for the
    f32-exactness bound). Falls back to jnp.cumsum off the fast path (length
    not a multiple of 128, or tiny arrays not worth a kernel launch).

    clip_hi may be a traced scalar; it is applied as clip(cum + bias, 0, hi).
    """
    (n,) = x.shape
    if n % 128 != 0 or n < 128 * 64:
        out = jnp.cumsum(x.astype(jnp.int32)) + bias
        if clip_hi is not None:
            out = jnp.clip(out, 0, clip_hi)
        return out

    rows = n // 128
    grid = pl.cdiv(rows, BLOCK_ROWS)
    x2 = x.reshape(rows, 128)
    if clip_hi is not None and not isinstance(clip_hi, (int, float)):
        # traced clip bound: clip outside the kernel (still fused by XLA)
        out = _call(x2, rows, grid, bias, None, interpret)
        return jnp.clip(out.reshape(n), 0, clip_hi)
    out = _call(x2, rows, grid, bias, clip_hi, interpret)
    return out.reshape(n)


def _call(x2, rows, grid, bias, clip_hi, interpret):
    kern = functools.partial(
        _scan_kernel, bias=bias, clip_hi=clip_hi, n_rows=rows
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(x2.shape, jnp.int32),
        grid=(grid,),
        in_specs=[pl.BlockSpec((BLOCK_ROWS, 128), lambda b: (b, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BLOCK_ROWS, 128), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.int32)],
        interpret=interpret,
    )(x2)
