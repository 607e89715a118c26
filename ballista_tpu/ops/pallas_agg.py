"""Pallas fused single-pass masked aggregation (TPU fast path).

The MaskedLayout broadcast-reduce (ops/segagg.py) reads every
contribution T times — one (T, n) masked reduce per aggregate. This
kernel makes ONE pass over the rows: each grid step loads a row block
into VMEM once and accumulates all T slots x A aggregates into a VMEM
accumulator, so HBM traffic drops from T x (sum of column bytes) to
1 x (sum of column bytes).

Exactness without 64-bit lanes: int64 contributions are passed as
(lo32, hi32) words (a bit-exact reinterpret, no extra HBM bytes) and
accumulated as eight 8-bit limbs in int32 lanes. With n <= 2^23 rows
per kernel call the per-limb sums stay below 2^31; the uint64
recombination outside the kernel is exact for signed sums by mod-2^64
wraparound (same trick as segagg._matmul_seg_sum's 7-bit MXU limbs).
Callers chunk larger inputs and add the int64 partials.

Reference parity: this is our DataFusion-hash-aggregate hot loop
(ballista has no kernels of its own; GroupedHashAggregateStream lives
in DataFusion). Gated behind BALLISTA_PALLAS_AGG=1 until the on-chip
A/B vs the XLA-fused masked reduce lands (the MXU one-hot variant
measured 2.6x SLOWER, so never assume — measure).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# rows per kernel invocation bound: 2^23 * 255 (max 8-bit limb) < 2^31
MAX_ROWS = 1 << 23
_LANE = 128
_SUB = 8                      # f32/i32 sublane tile
_BLOCK_ROWS = 8 * _SUB * _LANE  # 8192 rows per grid step


def _kernel(T: int, A: int, slot_ref, lo_ref, hi_ref, acc_ref):
    """One grid step: accumulate a (rows_blk,) block into acc.

    slot_ref: (R8, 128) int32 — row slots, dead rows >= T
    lo_ref/hi_ref: (A, R8, 128) int32 — low/high words per aggregate
    acc_ref: (T, A*8, 128) int32 — lane-wise limb partial sums. The
        cross-lane reduction happens OUTSIDE the kernel: Mosaic on this
        backend cannot lower full/scalar reductions (the final
        cross-lane step takes an int64 path — '64-bit types are not
        supported'), but axis-0 sublane reductions lower fine.
    """
    from jax.experimental import pallas as pl  # noqa: F401

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    slot = slot_ref[:]
    zero = jnp.zeros((), jnp.int32)
    # Build the whole (T, A*8, 128) update in registers and store it with
    # ONE full-block accumulate: integer-indexed ref stores create i64
    # index values under x64, which Mosaic fails to legalize
    # ("func.return (i32, i64)").
    rows = []
    for t in range(T):
        mask = slot == t
        for a in range(A):
            lo = lo_ref[a]
            hi = hi_ref[a]
            # eight 8-bit limbs from the two 32-bit words (int32 lanes)
            limbs = [(lo >> (8 * k)) & 0xFF for k in range(4)]
            limbs += [(hi >> (8 * k)) & 0xFF for k in range(4)]
            for k in range(8):
                rows.append(jnp.sum(jnp.where(mask, limbs[k], zero),
                                    axis=0, dtype=jnp.int32))
    upd = jnp.stack(rows).reshape(T, A * 8, _LANE)
    acc_ref[:] += upd


@functools.partial(jax.jit, static_argnums=(2, 3))
def _fused_limb_sums(row_slot, contribs64, T: int, interpret: bool):
    """contribs64: (A, n) int64 -> (T, A, 8) int32 limb sums."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    A, n = contribs64.shape
    assert n <= MAX_ROWS, "chunk the input (MAX_ROWS)"
    pad = (-n) % _BLOCK_ROWS
    if pad:
        row_slot = jnp.pad(row_slot, (0, pad), constant_values=T)
        contribs64 = jnp.pad(contribs64, ((0, 0), (0, pad)))
    npad = n + pad
    u = contribs64.astype(jnp.uint64)
    lo = (u & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32).astype(jnp.int32)
    hi = (u >> jnp.uint64(32)).astype(jnp.uint32).astype(jnp.int32)
    r8 = _BLOCK_ROWS // _LANE
    slot2 = row_slot.reshape(-1, _LANE)
    lo2 = lo.reshape(A, -1, _LANE)
    hi2 = hi.reshape(A, -1, _LANE)
    steps = npad // _BLOCK_ROWS

    # index-map constants must be int32: under x64 a literal 0 lowers
    # as i64 and Mosaic fails to legalize the mixed (i32, i64) return
    z = np.int32(0)
    out = pl.pallas_call(
        functools.partial(_kernel, T, A),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((r8, _LANE), lambda i: (i, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((A, r8, _LANE), lambda i: (z, i, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((A, r8, _LANE), lambda i: (z, i, z),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, A * 8, _LANE), lambda i: (z, z, z),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, A * 8, _LANE), jnp.int32),
        interpret=interpret,
    )(slot2, lo2, hi2)
    # cross-lane reduce outside the kernel (int64: exact, no overflow)
    return out.astype(jnp.int64).sum(axis=2).reshape(T, A, 8)


def fused_masked_sums(row_slot, contribs, T: int, interpret: bool = False):
    """Exact per-slot int64 sums for several aggregates in one pass.

    row_slot: (n,) int32 in [0, T]; dead rows == T.
    contribs: list of (n,) int64 arrays (already masked: dead/invalid
        rows must carry 0 — the caller applies validity masks).
    Returns (T, A) int64.
    """
    A = len(contribs)
    c = jnp.stack([x.astype(jnp.int64) for x in contribs])
    n = c.shape[1]
    parts = []
    for s in range(0, n, MAX_ROWS):
        e = min(n, s + MAX_ROWS)
        parts.append(_fused_limb_sums(row_slot[s:e], c[:, s:e], T,
                                      interpret))
    limbs = parts[0]
    for p in parts[1:]:
        limbs = limbs + p
    # recombine: uint64 wraparound keeps signed sums exact
    tot = jnp.zeros((T, A), jnp.uint64)
    for k in range(8):
        tot = tot + (limbs[:, :, k].astype(jnp.uint64) << jnp.uint64(8 * k))
    return tot.astype(jnp.int64)


def use_pallas_agg() -> bool:
    import os
    return os.environ.get("BALLISTA_PALLAS_AGG", "0") == "1"
