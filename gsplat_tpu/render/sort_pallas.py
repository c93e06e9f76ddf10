"""Pallas TPU merge sort for pair-budget-sized arrays with payload.

XLA's TPU sort moves EVERY operand through every compare-exchange pass of a
small-base bitonic/merge network; at 26.4M rows x 10 f32 operands it costs
~296 ms on v5e (the top line of the dense step profile), at 41.9M x 2 ops
~113 ms. This sort splits the work TPU-natively:

- BASE pass: one grid step sorts 8192-element blocks entirely in VMEM with a
  bitonic network. Partner fetches at lane distances (<128) are 128-lane
  `dynamic_gather`s with static XOR index patterns; at row distances they are
  static row-block swaps (reshape + reversed concat). Payload rides the same
  select masks.
- MERGE rounds: log2(S/8192) rounds of merge-path block merges. XLA computes
  per-output-block split points with a vectorized binary search (tiny);
  each grid step DMAs the two 8448-element input windows (dynamic element
  offsets: sublane-dynamic + a <128 lane shift done with a double gather),
  masks window elements beyond their run with +inf, and runs a 16384-wide
  bitonic MERGE network (14 stages); the first 8192 outputs are the block.

All operands travel as ONE stacked (rows, n_ops*128) array (operand i on
lanes [128i, 128i+128) — aligned LANE slices are free, whereas a (rows,
n_ops, 128) middle-dim slice is a sublane relayout copy on every access) so
each window is a single DMA. Keys must be totally ordered under `<` in their dtype (f32
finite, or i32); ties group arbitrarily (same contract as
jax.lax.sort(is_stable=False) with num_keys=1). No counterpart exists in the
reference (no rasterizer data path); upstream CUDA 3DGS uses cub radix sort.

STATUS: measured experiment, NOT wired into the pipeline. On v5e at 26.4M
rows x 10 operands it profiles at ~304 ms (66 ms base pass + 12 x 19.8 ms
merge rounds) vs XLA's lax.sort at ~296 ms — parity, not a win; the merge
rounds run ~4x off their DMA floor (each moves 4 GB). Kept (with
tests/test_sort_pallas.py) as the base for a future radix-partition
replacement of the gradient key sort; the live pipeline stays on lax.sort.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BASE = 8192
BROWS = BASE // 128          # 64
# window rows: BASE + 8-row DMA start alignment + <128 lane shift
WROWS = BROWS + 16
PAD_TAIL = WROWS * 128 + 1024  # +inf tail so window DMAs never run off the end


def _f(x):
    return x.astype(jnp.float32)


def _partner(x, dist):
    """Element at flat index (row*128+lane) XOR dist, for power-of-2 dist."""
    if dist < 128:
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        return jnp.take_along_axis(x, lane ^ dist, axis=1)
    r = dist // 128
    rows = x.shape[0]
    x4 = x.reshape(rows // (2 * r), 2, r, 128)
    sw = jnp.concatenate([x4[:, 1:2], x4[:, 0:1]], axis=1)
    return sw.reshape(rows, 128)


def _stage(ops, dist, leu):
    """One compare-exchange stage. `leu` is the CONSTANT 0/1 int32 mask
    "this position takes the partner when partner < self" (else when
    self < partner). Kept in int32 arithmetic end to end: Mosaic crashes on
    large constant BOOL vectors (i8->i1 trunci), so the only booleans here
    are runtime compare results."""
    pk = _partner(ops[0], dist)
    lt_a = (pk < ops[0]).astype(jnp.int32)
    lt_b = (ops[0] < pk).astype(jnp.int32)
    tp = (leu * lt_a + (1 - leu) * lt_b) == 1
    out = [jnp.where(tp, pk, ops[0])]
    for o in ops[1:]:
        out.append(jnp.where(tp, _partner(o, dist), o))
    return out


def _flat_iota(rows):
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0)
    l = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    return r * 128 + l


def _bitonic_sort_block(ops):
    """Full ascending bitonic sort of a (BROWS, 128) flat-row-major block."""
    f = _flat_iota(BROWS)
    for k in range(1, 14):              # sizes 2 .. 8192
        up = 1 - ((f >> k) & 1)         # 0/1 int32
        for j in reversed(range(k)):
            dist = 1 << j
            is_lower = 1 - ((f >> j) & 1)
            leu = 1 - (is_lower ^ up)
            ops = _stage(ops, dist, leu)
    return ops


def _bitonic_merge_block(ops, rows):
    """Ascending bitonic MERGE of a (rows, 128) block holding an ascending
    first half and a descending second half."""
    f = _flat_iota(rows)
    n = rows * 128
    for j in reversed(range(int(np.log2(n)))):
        dist = 1 << j
        leu = 1 - ((f >> j) & 1)        # is_lower as 0/1 int32
        ops = _stage(ops, dist, leu)
    return ops


def _base_kernel(x_ref, o_ref, *, n_ops):
    ops = [x_ref[:, 128 * i:128 * (i + 1)] for i in range(n_ops)]
    ops = _bitonic_sort_block(ops)
    for i in range(n_ops):
        o_ref[:, 128 * i:128 * (i + 1)] = ops[i]


def _shift_window(win, slot, i, delta):
    """Operand i's (BROWS,128) view of window slot `slot`, whose flat element
    0 sits at in-window flat offset `delta` in [0, 1152): a dynamic sublane
    slice for the row part plus a <128 lane shift done as two 128-lane
    gathers (same row / next row) + select. Slices the scratch ref per
    (slot, operand) to keep live vregs small."""
    # Mosaic constraints: vector loads need 8-row-multiple shapes AND
    # provably 8-aligned dynamic starts — so load the whole slot (static-ish
    # start) and do the row shift with a dynamic pltpu.roll (jnp.roll
    # semantics; negative/dynamic-negative shifts are silently wrong, so
    # always pass a positive shift).
    w80 = win[pl.ds(pl.multiple_of(slot * WROWS, 8), WROWS),
              128 * i:128 * (i + 1)]
    rres = delta >> 7                         # [0, 8)
    w = pltpu.roll(w80, jax.lax.rem(WROWS - rres, WROWS), 0)[0:BROWS + 1]
    d = delta & 127
    lane = jax.lax.broadcasted_iota(jnp.int32, (BROWS + 1, 128), 1)
    idx = (lane + d) & 127
    same = jnp.take_along_axis(w, idx, axis=1)
    nxt = jnp.take_along_axis(
        jnp.concatenate([w[1:], w[:1]], axis=0), idx, axis=1
    )
    shifted = jnp.where(lane + d < 128, same, nxt)
    return shifted[0:BROWS, :]


def _merge_kernel(meta_ref, x_hbm, o_ref, win, sems, *, n_ops, inf_key):
    """meta (4*nblk,) prefetch: [sa, a_end, sb, b_end] element offsets per
    output block. Window DMAs double-buffered across grid steps; elements at
    global index >= *_end masked to +inf so runs never leak across blocks."""
    g = pl.program_id(0)
    nblk = pl.num_programs(0)

    def dma(block, side):
        start = meta_ref[4 * block + 2 * side]
        row = pl.multiple_of(((start >> 7) // 8) * 8, 8)  # 8-row aligned
        slot = (block % 2) * 2 + side
        dst = win.at[pl.ds(pl.multiple_of(slot * WROWS, 8), WROWS)]
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(row, WROWS)], dst, sems.at[slot]
        )

    @pl.when(g == 0)
    def _():
        dma(0, 0).start()
        dma(0, 1).start()

    @pl.when(g + 1 < nblk)
    def _():
        dma(g + 1, 0).start()
        dma(g + 1, 1).start()

    dma(g, 0).wait()
    dma(g, 1).wait()

    sa = meta_ref[4 * g]
    a_end = meta_ref[4 * g + 1]
    sb = meta_ref[4 * g + 2]
    b_end = meta_ref[4 * g + 3]
    slot_a = (g % 2) * 2
    slot_b = slot_a + 1

    f = _flat_iota(BROWS)
    da = sa - ((sa >> 7) // 8) * 8 * 128   # in-window flat offset, [0, 1152)
    db_ = sb - ((sb >> 7) // 8) * 8 * 128
    a_ops = [_shift_window(win, slot_a, i, da) for i in range(n_ops)]
    b_ops = [_shift_window(win, slot_b, i, db_) for i in range(n_ops)]
    a_ops[0] = jnp.where(sa + f < a_end, a_ops[0], inf_key)
    b_ops[0] = jnp.where(sb + f < b_end, b_ops[0], inf_key)

    # descending B: reverse flat order. Mosaic has no `rev` lowering; row
    # reversal (row XOR 63) composes the 6 power-of-2 row-block swaps, lane
    # reversal (lane XOR 127) is one 128-lane gather.
    lane = jax.lax.broadcasted_iota(jnp.int32, (BROWS, 128), 1)

    def _rev(o):
        for d in (128, 256, 512, 1024, 2048, 4096):
            o = _partner(o, d)
        return jnp.take_along_axis(o, 127 - lane, axis=1)

    b_ops = [_rev(o) for o in b_ops]
    ops = [jnp.concatenate([a, b], axis=0) for a, b in zip(a_ops, b_ops)]
    ops = _bitonic_merge_block(ops, 2 * BROWS)
    for i in range(n_ops):
        o_ref[:, 128 * i:128 * (i + 1)] = ops[i][0:BROWS, :]


def _merge_splits(keys, nblk, L, n_main, inf_key):
    """Vectorized merge-path split search: for each output block o (size
    BASE), how many elements come from run A of its run pair. keys: flat
    (n_total,) PADDED array. Returns sa, a_end, sb, b_end (nblk,) i32."""
    o = jnp.arange(nblk, dtype=jnp.int32)
    pair = (o * BASE) // (2 * L)
    base = pair * (2 * L)
    t = o * BASE - base
    a_len = jnp.clip(n_main - base, 0, L)
    b_len = jnp.clip(n_main - base - L, 0, L)
    lo = jnp.maximum(0, t - b_len)
    hi = jnp.minimum(t, a_len)
    n_total = keys.shape[0]

    def pred(s):
        # P(s): A[s-1] <= B[t-s]  (ties take from A first); out-of-range
        # A[-1] = -inf -> True, B[>=len] = +inf -> True
        a_idx = jnp.clip(base + s - 1, 0, n_total - 1)
        b_idx = jnp.clip(base + L + t - s, 0, n_total - 1)
        a_v = keys[a_idx]
        b_v = jnp.where(t - s < b_len, keys[b_idx], inf_key)
        return jnp.where(s <= 0, True, a_v <= b_v)

    # binary search for the LARGEST s in [lo, hi] with P(s) (P is monotone
    # non-increasing in s)
    lo_s, hi_s = lo, hi
    for _ in range(int(np.log2(max(L, 2))) + 2):
        mid = (lo_s + hi_s + 1) >> 1
        ok = pred(mid)
        lo_s = jnp.where(ok, mid, lo_s)
        hi_s = jnp.where(ok, hi_s, mid - 1)
    s = lo_s
    sa = base + s
    sb = base + L + (t - s)
    a_end = base + a_len
    b_end = base + L + b_len
    # clamp starts so window DMAs stay inside the padded array
    max_start = n_total - WROWS * 128
    return (jnp.minimum(sa, max_start), a_end,
            jnp.minimum(sb, max_start), b_end)


def sort_with_payload(operands, *, interpret: bool = False):
    """Sort `operands` (tuple of same-length 1-D 32-bit arrays) ascending by
    operands[0]. Equivalent to jax.lax.sort(operands, num_keys=1,
    is_stable=False) up to tie order. Key dtype must be f32 (finite) or i32."""
    key = operands[0]
    (S,) = key.shape
    n_ops = len(operands)
    kdt = key.dtype
    assert kdt in (jnp.float32, jnp.int32), kdt
    inf_key = float("inf") if kdt == jnp.float32 else (2**31 - 1)

    n_main = -(-S // BASE) * BASE
    n_total = n_main + PAD_TAIL
    nblk = n_main // BASE

    # stacked layout (rows, n_ops*128); pad with +inf keys
    stacked = []
    for i, op in enumerate(operands):
        fill = inf_key if i == 0 else 0
        p = jnp.full((n_total,), fill, op.dtype)
        p = p.at[:S].set(op)
        stacked.append(p.view(jnp.int32).reshape(-1, 128))
    x = jnp.stack(stacked, axis=1).reshape(-1, n_ops * 128)  # i32 bits

    def keyed(arr):  # operand 0 back in key dtype for compares
        return arr if kdt == jnp.int32 else arr.view(jnp.float32)

    # ---- base pass ----
    kb = functools.partial(_base_kernel, n_ops=n_ops)
    rows_main = n_main // 128

    def basecall(xin):
        # sort operand-0 dtype: bitcast rows to key dtype for compares by
        # viewing inside the kernel is awkward; instead run the kernel on a
        # bitcast copy where operand 0 is already key-typed. For i32 keys the
        # bits are the values; for f32 keys we bitcast the whole stacked
        # array to f32 (payload bits travel unchanged).
        dt = jnp.float32 if kdt == jnp.float32 else jnp.int32
        xin2 = xin.view(dt)
        return pl.pallas_call(
            kb,
            out_shape=jax.ShapeDtypeStruct((rows_main, n_ops * 128), dt),
            grid=(rows_main // BROWS,),
            in_specs=[pl.BlockSpec((BROWS, n_ops * 128), lambda b: (b, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((BROWS, n_ops * 128), lambda b: (b, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(xin2[:rows_main])

    sorted_main = basecall(x)
    # re-attach the +inf tail (windows may read it)
    x = jnp.concatenate([sorted_main.view(jnp.int32), x[rows_main:]], axis=0)

    # ---- merge rounds ----
    km = functools.partial(_merge_kernel, n_ops=n_ops, inf_key=inf_key)
    L = BASE
    while L < n_main:
        keys_flat = keyed(x[:, :128]).reshape(-1)
        sa, a_end, sb, b_end = _merge_splits(
            keys_flat, nblk, L, n_main, inf_key
        )
        meta = jnp.stack([sa, a_end, sb, b_end], axis=1).reshape(-1)
        dt = jnp.float32 if kdt == jnp.float32 else jnp.int32
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblk,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((BROWS, n_ops * 128), lambda b, *_: (b, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((4 * WROWS, n_ops * 128), dt),
                pltpu.SemaphoreType.DMA((4,)),
            ],
        )
        out = pl.pallas_call(
            km,
            out_shape=jax.ShapeDtypeStruct((rows_main, n_ops * 128), dt),
            grid_spec=grid_spec,
            interpret=interpret,
        )(meta, x.view(dt))
        x = jnp.concatenate([out.view(jnp.int32), x[rows_main:]], axis=0)
        L *= 2

    outs = []
    for i, op in enumerate(operands):
        outs.append(
            x[:rows_main, 128 * i:128 * (i + 1)].reshape(n_main)[:S]
            .view(op.dtype)
        )
    return tuple(outs)
