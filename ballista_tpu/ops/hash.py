"""Vectorized hashing + open-addressing group/join tables in pure JAX.

Reference parity: DataFusion's RawTable-based hash aggregate / hash join
(the engine kernel under Ballista — SURVEY.md §1 notes Ballista itself has
no compute kernels). CPU hash tables chase pointers row-by-row; on TPU we
instead resolve all rows *in parallel* with an iterative claim protocol:

  each unresolved row probes slot (h0 + probe) mod T;
  rows seeing an empty slot race to claim it via scatter-min of row index;
  winners install their key, losers re-check (the slot is now occupied,
  possibly by an equal key); rows seeing an occupied non-matching slot
  advance their probe.

Every step is a fixed-shape gather/scatter over the whole batch — XLA maps
it onto the VPU; the loop runs O(max collision chain) iterations, not O(N).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

UINT = jnp.uint32


def hash_columns(key_datas: Sequence[jax.Array],
                 key_valids: Sequence[jax.Array],
                 seed: int = 0x9E3779B9) -> jax.Array:
    """Combine key columns into a uint32 hash (murmur3-style finalizer).

    NULLs hash as a distinct value (SQL GROUP BY puts all NULLs in one
    group), so validity participates in the hash. `seed` decorrelates
    different uses (shuffle destination vs table slot) of the same keys —
    without it a post-shuffle group table would only populate 1/P of its
    slots.
    """
    h = jnp.full(key_datas[0].shape, seed, dtype=UINT)
    for data, valid in zip(key_datas, key_valids):
        d = data.astype(jnp.int64)
        lo = (d & 0xFFFFFFFF).astype(UINT)
        hi = ((d >> 32) & 0xFFFFFFFF).astype(UINT)
        for part in (lo, hi, valid.astype(UINT)):
            k = part * jnp.uint32(0xCC9E2D51)
            k = (k << 15) | (k >> 17)
            k = k * jnp.uint32(0x1B873593)
            h = h ^ k
            h = (h << 13) | (h >> 19)
            h = h * jnp.uint32(5) + jnp.uint32(0xE6546B64)
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


class GroupTable(NamedTuple):
    """Result of group-code assignment over one batch."""
    row_slot: jax.Array    # (N,) int32 slot id per row; -1 for dead/overflow rows
    slot_used: jax.Array   # (T,) bool
    slot_row: jax.Array    # (T,) int32 index of the row that installed the slot
    overflow: jax.Array    # () bool — table too small, retry with bigger T


def _norm_keys(key_datas, key_valids):
    """Canonicalize keys for equality compare: invalid -> fixed sentinel."""
    out = []
    for data, valid in zip(key_datas, key_valids):
        d = data.astype(jnp.int64)
        out.append(jnp.where(valid, d, jnp.int64(-(2**62))))
    return out


def plan_key_packing(bounds, null_slots: bool, max_bits: int = 62):
    """Static packing plan for equality keys with known value bounds.

    bounds: per key, (lo, hi) or None. Keys with bounds pack into shared
    <=62-bit int64 limbs (equality-preserving bijection; sort compile
    time is superlinear in operand count and every limb saved is ~11ms
    of data movement at 6M rows). null_slots=True reserves slot 0 per
    field so NULL forms its own group (grouping semantics); False leaves
    NULL to the packed column's validity (join semantics: null keys
    never match). Field widths round up to 4-bit multiples so compiled
    programs survive modest data growth. Returns (groups, unpacked):
    groups = lists of (key_index, lo, bits); unpacked = key indices kept
    as their own operand."""
    fields = []
    for b in bounds:
        if b is None:
            fields.append(None)
            continue
        lo, hi = int(b[0]), int(b[1])
        span = hi - lo
        need = (span + (2 if null_slots else 1)).bit_length()
        bits = max(((need + 3) // 4) * 4, 4)
        fields.append((lo, bits) if bits <= max_bits else None)
    groups, cur, cur_bits, unpacked = [], [], 0, []
    for i, f in enumerate(fields):
        if f is None:
            unpacked.append(i)
            continue
        lo, bits = f
        if cur and cur_bits + bits > max_bits:
            groups.append(cur)
            cur, cur_bits = [], 0
        cur.append((i, lo, bits))
        cur_bits += bits
    if cur:
        groups.append(cur)
    return groups, unpacked


def pack_key_columns(cols, groups, unpacked, null_slots: bool):
    """Apply a plan_key_packing plan to a list of Columns; returns the
    reduced column list (packed limbs first, then unpacked keys)."""
    from ..batch import Column
    out = []
    for g in groups:
        v = None
        valid_all = None
        for i, lo, bits in g:
            c = cols[i]
            d = c.data.astype(jnp.int64) - jnp.int64(lo)
            if null_slots:
                fv = jnp.where(c.validity, d + 1, jnp.int64(0))
            else:
                fv = jnp.where(c.validity, d, jnp.int64(0))
                valid_all = (c.validity if valid_all is None
                             else valid_all & c.validity)
            v = fv if v is None else ((v << bits) | fv)
        validity = (jnp.ones_like(v, dtype=jnp.bool_) if null_slots
                    else valid_all)
        out.append(Column(v, validity))
    out.extend(cols[i] for i in unpacked)
    return out


@partial(jax.jit, static_argnames=("table_size",))
def group_codes(key_datas: Tuple[jax.Array, ...],
                key_valids: Tuple[jax.Array, ...],
                live: jax.Array,
                table_size: int) -> GroupTable:
    """Assign a stable slot id to every live row such that equal keys share
    a slot. table_size must be a power of two > number of distinct keys."""
    n = key_datas[0].shape[0]
    T = table_size
    mask = T - 1
    assert T & mask == 0, "table_size must be a power of two"

    keys = _norm_keys(key_datas, key_valids)
    nk = len(keys)
    h0 = (hash_columns(key_datas, key_valids) & jnp.uint32(mask)).astype(jnp.int32)

    row_idx = jnp.arange(n, dtype=jnp.int32)
    BIG = jnp.int32(2**30)

    # slot state; extra overflow slot T for scatter of inactive rows
    slot_keys0 = jnp.zeros((nk, T + 1), dtype=jnp.int64)
    slot_used0 = jnp.zeros(T + 1, dtype=jnp.bool_)
    slot_row0 = jnp.full(T + 1, -1, dtype=jnp.int32)

    state0 = (
        jnp.where(live, -1, -2).astype(jnp.int32),  # row_slot: -1 unresolved, -2 dead
        jnp.zeros(n, dtype=jnp.int32),              # probe count
        slot_keys0, slot_used0, slot_row0,
    )

    def cond(state):
        row_slot, probe, *_ = state
        unresolved = (row_slot == -1) & (probe < T)
        return jnp.any(unresolved)

    def body(state):
        row_slot, probe, slot_keys, slot_used, slot_row = state
        unresolved = row_slot == -1
        cand = jnp.where(unresolved, (h0 + probe) & mask, T)

        occupied = slot_used[cand]
        match = occupied
        for k in range(nk):
            match = match & (slot_keys[k, cand] == keys[k])
        # resolved by matching an existing slot
        row_slot = jnp.where(unresolved & match, cand, row_slot)

        # empty slot: race to claim via scatter-min of row index
        want_claim = unresolved & ~occupied
        claim_idx = jnp.where(want_claim, cand, T)
        claims = jnp.full(T + 1, BIG, dtype=jnp.int32).at[claim_idx].min(
            jnp.where(want_claim, row_idx, BIG))
        winner = want_claim & (claims[cand] == row_idx)
        wi = jnp.where(winner, cand, T)
        for k in range(nk):
            slot_keys = slot_keys.at[k, wi].set(
                jnp.where(winner, keys[k], slot_keys[k, wi]))
        slot_used = slot_used.at[wi].set(jnp.where(winner, True, slot_used[wi]))
        slot_row = slot_row.at[wi].set(jnp.where(winner, row_idx, slot_row[wi]))
        row_slot = jnp.where(winner, cand, row_slot)

        # occupied with a different key: advance probe (claim losers retry
        # the same slot next round, which is now occupied)
        bump = unresolved & occupied & ~match
        probe = jnp.where(bump, probe + 1, probe)
        return row_slot, probe, slot_keys, slot_used, slot_row

    row_slot, probe, slot_keys, slot_used, slot_row = jax.lax.while_loop(
        cond, body, state0)

    overflow = jnp.any((row_slot == -1))
    row_slot = jnp.where(row_slot < 0, -1, row_slot)
    return GroupTable(row_slot, slot_used[:T], slot_row[:T], overflow)


class JoinTable(NamedTuple):
    slot_used: jax.Array   # (T,) bool
    slot_row: jax.Array    # (T,) int32 build-side row index
    dup_keys: jax.Array    # () bool — build keys were not unique
    overflow: jax.Array    # () bool


@partial(jax.jit, static_argnames=("table_size",))
def build_join_table(key_datas, key_valids, live, table_size: int) -> JoinTable:
    """Build an open-addressing table mapping key -> build row (unique keys).

    Duplicate build keys are detected and reported (`dup_keys`); the planner
    falls back to the expanding join path in that case.
    """
    gt = group_codes(tuple(key_datas), tuple(key_valids), live, table_size)
    n = key_datas[0].shape[0]
    # a live row whose slot_row differs from itself means a duplicate key
    row_idx = jnp.arange(n, dtype=jnp.int32)
    safe_slot = jnp.where(gt.row_slot >= 0, gt.row_slot, 0)
    dup = jnp.any(live & (gt.row_slot >= 0) & (gt.slot_row[safe_slot] != row_idx))
    return JoinTable(gt.slot_used, gt.slot_row, dup, gt.overflow)


@partial(jax.jit, static_argnames=("table_size",))
def probe_join_table(slot_used, slot_row,
                     build_keys, build_valids,
                     probe_keys, probe_valids,
                     probe_live, table_size: int):
    """Probe: for each probe row return the matching build row index or -1.

    SQL join semantics: NULL keys never match (unlike GROUP BY).
    """
    T = table_size
    mask = T - 1
    n = probe_keys[0].shape[0]
    nk = len(probe_keys)
    bkeys = _norm_keys(build_keys, build_valids)
    pkeys = _norm_keys(probe_keys, probe_valids)
    h0 = (hash_columns(probe_keys, probe_valids) & jnp.uint32(mask)).astype(jnp.int32)

    null_key = probe_live
    for v in probe_valids:
        null_key = null_key  # keep live mask; null handling below
    any_null = jnp.zeros(n, dtype=jnp.bool_)
    for v in probe_valids:
        any_null = any_null | ~v

    state0 = (
        jnp.where(probe_live & ~any_null, -1, -2).astype(jnp.int32),  # match row; -1 unresolved
        jnp.zeros(n, dtype=jnp.int32),
    )

    def cond(state):
        m, probe = state
        return jnp.any((m == -1) & (probe < T))

    def body(state):
        m, probe = state
        unresolved = m == -1
        cand = jnp.where(unresolved, (h0 + probe) & mask, 0)
        occupied = slot_used[cand]
        brow = slot_row[cand]
        match = occupied
        for k in range(nk):
            match = match & (jnp.take(bkeys[k], brow, mode="clip") == pkeys[k])
        m = jnp.where(unresolved & match, brow, m)
        m = jnp.where(unresolved & ~occupied, -3, m)  # empty slot -> no match
        probe = jnp.where(unresolved & occupied & ~match, probe + 1, probe)
        return m, probe

    m, _ = jax.lax.while_loop(cond, body, state0)
    return jnp.where(m >= 0, m, -1)
