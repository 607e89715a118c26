"""Variadic-sort data movement: sort payloads ride the key sort.

Measured on v5e (6M rows): jnp.take (random gather) costs ~89 ms/column,
while XLA's variadic sort moves 8 payload columns in ~114 ms total
(~11 ms/column marginal) — gathering through an argsort permutation is
6-8x slower than sorting the payload columns alongside the keys. So the
engine's rule is: NEVER materialize a permutation and gather; pass the
batch's columns as extra sort operands (`jax.lax.sort(..., num_keys=k)`).

Used by filter compaction, SortExec, join output compaction, and the
shuffle's destination grouping. (Random gathers remain only where indices
are genuinely not a permutation — e.g. build-side payload fetch.)
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..batch import Batch, Column


_WBITS = 63  # usable bits per int64 bitmask word (avoid the sign bit)


def _pack_columns(cols):
    """Pack columns into the fewest int64 sort operands: bools (data and
    every validity) become bits of shared bitmask words, int32/f32 pairs
    share one int64 limb, int64/f64 bitcast straight through.

    Measured on v5e at 6.2M rows: XLA sort COMPILE time grows superlinearly
    in operand count (25 operands 210s, 14 operands 82s) while RUN time is
    flat (~34ms either way) — so minimizing operands is pure compile-time
    win. Returns (operands, unpack) where unpack(sorted_operands) -> cols."""
    bits = []     # bool arrays -> bitmask word bits
    halves = []   # int32-viewed arrays -> int64 limb halves
    wides = []    # int64-viewed arrays
    plan = []     # per column: (kind, slot, cast, vslot)
    for c in cols:
        d = c.data
        if d.dtype == jnp.bool_:
            plan.append(("bit", len(bits), None, len(bits) + 1))
            bits.append(d)
        elif d.dtype.itemsize == 8:
            # 64-bit payloads ride as their own operands WITHOUT a
            # bitcast: the axon remote compile service's x64-removal
            # rewrite has no bitcast-convert(s64) lowering (found by
            # ab_exchange.py — TPC-H never sorts big f64 columns, so the
            # suite never hit it). lax.sort carries f64 operands fine.
            plan.append(("w64", len(wides), None, len(bits)))
            wides.append(d)
        else:
            cast = None if d.dtype == jnp.int32 else d.dtype
            plan.append(("w32", len(halves), cast, len(bits)))
            halves.append(d if cast is None
                          else jax.lax.bitcast_convert_type(d, jnp.int32))
        bits.append(c.validity)

    operands = list(wides)
    n64 = len(wides)
    for i in range(0, len(halves), 2):
        lo = halves[i].astype(jnp.int64) & jnp.int64(0xFFFFFFFF)
        if i + 1 < len(halves):
            hi = halves[i + 1].astype(jnp.int64) << 32
            operands.append(hi | lo)
        else:
            operands.append(lo)
    npair = len(operands) - n64
    for w in range(0, len(bits), _WBITS):
        chunk = bits[w:w + _WBITS]
        word = chunk[0].astype(jnp.int64)
        for i, b in enumerate(chunk[1:], start=1):
            word = word | (b.astype(jnp.int64) << i)
        operands.append(word)

    def unpack(sorted_ops):
        def bit(i):
            w, o = divmod(i, _WBITS)
            return ((sorted_ops[n64 + npair + w] >> o) & 1).astype(jnp.bool_)

        out = []
        for kind, slot, cast, vslot in plan:
            valid = bit(vslot)
            if kind == "bit":
                data = bit(slot)
            elif kind == "w64":
                data = sorted_ops[slot]
                if cast is not None:
                    data = jax.lax.bitcast_convert_type(data, cast)
            else:
                limb = sorted_ops[n64 + slot // 2]
                half = (limb >> 32) if slot % 2 else limb
                data = half.astype(jnp.int32)
                if cast is not None:
                    data = jax.lax.bitcast_convert_type(data, cast)
            out.append(Column(data, valid))
        return out

    return operands, unpack


def pack_columns(cols):
    """Public alias of `_pack_columns` for pipelines that keep the packed
    representation alive across several data movements (the shuffle rides
    packed limbs through sort -> slot gather -> all_to_all -> receive
    compaction and unpacks ONCE at the end — ~4x fewer gathers and ~2-3x
    fewer collectives than moving per-column data+validity arrays)."""
    return _pack_columns(cols)


def sort_batch_columns(keys: Sequence[jax.Array], batch: Batch,
                       extra: Sequence[jax.Array] = (),
                       is_stable: bool = True):
    """Sort the batch's columns (and `extra` arrays) by `keys`.

    Returns (sorted Batch with original num_rows, sorted extras tuple,
    sorted keys tuple). Keys must already encode direction/null placement
    (ops.sort._rankable) and liveness (dead rows to the back) as the
    caller requires. Payload columns ride the sort packed (_pack_columns)
    to keep the operand count — and with it XLA compile time — low."""
    packed, unpack = _pack_columns(batch.columns)
    operands = tuple(keys) + tuple(packed) + tuple(extra)
    out = jax.lax.sort(operands, num_keys=len(keys), is_stable=is_stable)
    nk = len(keys)
    npk = len(packed)
    cols = tuple(unpack(out[nk:nk + npk]))
    extras = out[nk + npk:]
    return Batch(cols, batch.num_rows), extras, tuple(out[:nk])


def rank_in_sorted(csum: jax.Array, M: int) -> jax.Array:
    """i[j] = #{k: csum[k] <= j} for j = 0..M-1 — equivalent to
    jnp.searchsorted(csum, arange(M), side='right') for sorted csum, but
    via a two-sort merge: XLA's searchsorted lowering costs ~2.8s for 6M
    queries on v5e while two sorts cost ~150ms. Used by the expanding
    join's output-slot -> probe-row mapping.

    Merge argument: stable-sort concat(csum, 0..M-1) with csum entries
    ordered before equal j entries; a j entry's sorted position p has j
    smaller-j entries before it, so #csum-entries <= j is p - j."""
    npn = csum.shape[0]
    j64 = jnp.arange(M, dtype=jnp.int64)
    # ONE packed operand per sort (operand count drives compile time):
    # (value << mb+1) | (is_j << mb) | j. csum entries clip to M — they
    # compare identically against every j < M and only their count below
    # a j matters.
    mb = max(M, 1).bit_length()
    a = jnp.minimum(csum.astype(jnp.int64), jnp.int64(M)) << (mb + 1)
    b = (j64 << (mb + 1)) | (jnp.int64(1) << mb) | j64
    (s,) = jax.lax.sort((jnp.concatenate([a, b]),), num_keys=1,
                        is_stable=False)
    pos = jnp.arange(npn + M, dtype=jnp.int64)
    jv = s & ((jnp.int64(1) << mb) - 1)
    isj = ((s >> mb) & 1).astype(jnp.bool_)
    i_sorted = pos - jv
    # route j entries back to j order (csum entries sink via sentinel M)
    bk = jnp.where(isj, jv, jnp.int64(M))
    limb = (bk << 31) | i_sorted
    (sb,) = jax.lax.sort((limb,), num_keys=1, is_stable=False)
    return (sb & ((jnp.int64(1) << 31) - 1)).astype(jnp.int32)[:M]


def first_positions(first: jax.Array, T: int) -> jax.Array:
    """Positions of the g-th True in `first`, for g < T (garbage past the
    count — callers mask). One stable bool-keyed sort instead of a T-query
    searchsorted over the cumsum."""
    n = first.shape[0]
    pos = jnp.arange(n, dtype=jnp.int64)
    limb = ((~first).astype(jnp.int64) << 32) | pos
    (out,) = jax.lax.sort((limb,), num_keys=1, is_stable=False)
    return (out & 0xFFFFFFFF).astype(jnp.int32)[:T]


def compact_batch(batch: Batch, keep: jax.Array) -> Batch:
    """keep=True rows to the front (stable), num_rows = count, validity
    masked past the count. The variadic-sort replacement for
    compaction_perm + gather_batch."""
    count = jnp.sum(keep).astype(jnp.int32)
    out, _, _ = sort_batch_columns((~keep,), batch)
    live = jnp.arange(batch.capacity, dtype=jnp.int32) < count
    cols = tuple(Column(c.data, c.validity & live) for c in out.columns)
    return Batch(cols, count)
