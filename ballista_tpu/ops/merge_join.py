"""Co-sort merge join: match probe rows to unique-key build rows without
hash tables, scatters, or while_loops.

Motivation (measured, v5e): the open-addressing build loop costs one
450-880 ms scatter per probe iteration, while sorting 7.5M keys costs
~40 ms. So: concatenate build+probe keys, one stable lexicographic sort
(build rows precede probe rows of the same key), then the run-head build
row propagates to its probe rows.

Data movement is variadic-sort-first (ops/vsort.py): the flag and
concat-index ride the key sort as payload operands, the run-head lookup is
a cummax forward-fill (_run_head_fill — a 6M-row gather costs ~115ms on
v5e, cummax ~20ms), and results route back to original positions with a
second sort keyed by concat index.

Handles multi-key joins and SQL NULL semantics (null keys never match).
Requires unique build keys (the planner's fast path; duplicates go
through ops.expand_join).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .hash import _norm_keys


def _cosort(comb, is_build, n):
    """Stable lexicographic sort of combined keys carrying ONE packed
    payload (cidx<<1 | is_build): sort compile time is superlinear in
    operand count and runtime pays ~11ms/operand at 6M rows on v5e, so
    the flag rides the index's low bit. Returns (s_keys, s_packed) with
    s_packed = sorted (cidx<<1 | is_build) int32."""
    cidx = jnp.arange(n, dtype=jnp.int32)
    packed = (cidx << 1) | is_build.astype(jnp.int32)
    out = jax.lax.sort(tuple(comb) + (packed,),
                       num_keys=len(comb), is_stable=True)
    k = len(comb)
    return out[:k], out[k]


def _runs(s_keys, n):
    pos = jnp.arange(n, dtype=jnp.int32)
    prev_same = jnp.ones(n, dtype=jnp.bool_)
    for k in s_keys:
        rolled = jnp.concatenate([k[:1], k[:-1]])
        prev_same = prev_same & (k == rolled)
    first = ~prev_same | (pos == 0)
    return pos, first


def _run_head_fill(pos, first, packed, n, vbits=None):
    """(head, start_pos): forward-fill `packed` from run starts — head[i] =
    packed[start of i's run]. ONE int64 cummax replaces the old
    cummax+gather (a 6M-row gather costs ~115ms on v5e, cummax ~20ms): tag
    each run start with its position in the high bits so later starts
    dominate under max, then strip the tag. `packed` must be non-negative
    and < 2^vbits (default: wide enough for (cidx << 1 | flag))."""
    if vbits is None:
        vbits = (2 * n + 1).bit_length()
    tagged = jnp.where(first,
                       (pos.astype(jnp.int64) << vbits) | packed,
                       jnp.int64(0))
    filled = jax.lax.cummax(tagged)
    head = filled & ((jnp.int64(1) << vbits) - 1)
    start_pos = (filled >> vbits).astype(jnp.int32)
    return head, start_pos


@jax.jit
def tiny_probe_unique(build_keys: Tuple[jax.Array, ...],
                      build_valids: Tuple[jax.Array, ...],
                      build_live: jax.Array,
                      probe_keys: Tuple[jax.Array, ...],
                      probe_valids: Tuple[jax.Array, ...],
                      probe_live: jax.Array) -> jax.Array:
    """Unique-build probe for TINY build sides (<= ~128 rows): one fused
    (n, B) broadcast compare + max-reduce — no sorts at all. The cosort
    path costs two ~35ms 6M-row sorts regardless of build size; nation/
    region joins (B <= 128) reduce to a ~3ms streaming compare. Encoding:
    reduce max over (eq ? j+1 : 0) — unique build keys mean at most one
    hit — so 0 = miss and match = m - 1."""
    b_norm = _norm_keys(build_keys, build_valids)
    p_norm = _norm_keys(probe_keys, probe_valids)
    b_ok = build_live
    for v in build_valids:
        b_ok = b_ok & v
    eq = b_ok[None, :]
    for pk, bk in zip(p_norm, b_norm):
        eq = eq & (pk[:, None] == bk[None, :])
    B = b_norm[0].shape[0]
    j_plus = jnp.arange(B, dtype=jnp.int32) + 1
    m = jnp.max(jnp.where(eq, j_plus[None, :], 0), axis=1)
    p_ok = probe_live
    for v in probe_valids:
        p_ok = p_ok & v
    return jnp.where(p_ok, m - 1, -1)


from functools import partial


@partial(jax.jit, static_argnames=("lo", "key_bits", "pay_bits"))
def merge_probe_unique_packed(build_key: jax.Array, build_valid: jax.Array,
                              build_live: jax.Array,
                              probe_key: jax.Array, probe_valid: jax.Array,
                              probe_live: jax.Array,
                              lo: int, key_bits: int,
                              build_payload=None, pay_bits: int = 0):
    """Single-key co-sort merge probe where the key has known value
    bounds: key, concat-index, and build flag share ONE int64 sort
    operand — and concat order in the low bits makes the sort implicitly
    stable (build rows precede probes of the same key), so the whole
    match is one unstable single-operand sort + cummax + one more
    single-operand route-back sort. Slot layout: [0, span] = biased key,
    span+1 = NULL key, span+2 = dead row (NULL/NULL pairs fall in one
    run but probe nulls are post-filtered to -1, as in the generic
    path)."""
    nb = build_key.shape[0]
    np_ = probe_key.shape[0]
    n = nb + np_
    ib = (2 * n + 1).bit_length()  # bits for (cidx << 1 | flag)
    span_null = (jnp.int64(1) << key_bits) - 2  # NULL slot
    span_dead = span_null + 1                   # dead slot

    def slot(key, valid, live):
        biased = key.astype(jnp.int64) - jnp.int64(lo)
        s = jnp.where(valid, biased, span_null)
        return jnp.where(live, s, span_dead)

    cidx = jnp.arange(n, dtype=jnp.int64)
    flag = jnp.concatenate([build_live,
                            jnp.zeros(np_, dtype=jnp.bool_)])
    comb = (jnp.concatenate([slot(build_key, build_valid, build_live),
                             slot(probe_key, probe_valid, probe_live)])
            << ib) | (cidx << 1) | flag.astype(jnp.int64)
    if build_payload is None:
        (s,) = jax.lax.sort((comb,), num_keys=1, is_stable=False)
        s_pay = None
    else:
        # bounded build payload rides the cosort and forward-fills via the
        # same cummax trick: the build row's fields reach its probes with
        # NO materialization gather (a 6M-row packed gather is ~90ms;
        # cummax ~20ms)
        pay = jnp.concatenate([build_payload.astype(jnp.int64),
                               jnp.zeros(np_, jnp.int64)])
        s, s_pay = jax.lax.sort((comb, pay), num_keys=1, is_stable=False)
    s_keys = s >> ib
    s_packed = (s & ((jnp.int64(1) << ib) - 1)).astype(jnp.int32)
    pos, first = _runs([s_keys], n)

    head, _ = _run_head_fill(pos, first, s_packed.astype(jnp.int64), n)
    head_is_build = (head & 1).astype(jnp.bool_)
    matched_sorted = jnp.where(head_is_build,
                               (head >> 1).astype(jnp.int32), -1)

    s_cidx = s_packed >> 1
    limb = (s_cidx.astype(jnp.int64) << 32) | (
        (matched_sorted + 1).astype(jnp.int64))
    if s_pay is None:
        (limb,) = jax.lax.sort((limb,), num_keys=1, is_stable=False)
        match = (limb & 0xFFFFFFFF).astype(jnp.int32)[nb:] - 1
        return jnp.where(probe_live & probe_valid, match, -1)
    head_pay, _ = _run_head_fill(pos, first, s_pay, n, vbits=pay_bits)
    limb, pay_back = jax.lax.sort((limb, head_pay), num_keys=1,
                                  is_stable=False)
    match = (limb & 0xFFFFFFFF).astype(jnp.int32)[nb:] - 1
    match = jnp.where(probe_live & probe_valid, match, -1)
    return match, pay_back[nb:]


@jax.jit
def merge_probe_unique(build_keys: Tuple[jax.Array, ...],
                       build_valids: Tuple[jax.Array, ...],
                       build_live: jax.Array,
                       probe_keys: Tuple[jax.Array, ...],
                       probe_valids: Tuple[jax.Array, ...],
                       probe_live: jax.Array) -> jax.Array:
    """For each probe row: matching build row index, or -1."""
    nb = build_keys[0].shape[0]
    np_ = probe_keys[0].shape[0]
    n = nb + np_
    DEAD = jnp.int64(2**62)

    b_norm = _norm_keys(build_keys, build_valids)
    p_norm = _norm_keys(probe_keys, probe_valids)
    comb = [jnp.concatenate([jnp.where(build_live, bk, DEAD),
                             jnp.where(probe_live, pk, DEAD)])
            for bk, pk in zip(b_norm, p_norm)]
    is_build = jnp.concatenate([build_live,
                                jnp.zeros(np_, dtype=jnp.bool_)])

    s_keys, s_packed = _cosort(comb, is_build, n)
    pos, first = _runs(s_keys, n)

    # run-head lookup: cummax forward-fill of the packed (cidx<<1 | build)
    # payload — the cosort already carries exactly the value we fill
    head, _ = _run_head_fill(pos, first, s_packed.astype(jnp.int64), n)
    head_is_build = (head & 1).astype(jnp.bool_)
    matched_sorted = jnp.where(head_is_build,
                               (head >> 1).astype(jnp.int32), -1)

    # route back to original positions: ONE single-operand int64 sort of
    # (cidx << 32 | match+1) — cidx is a permutation, so sorting the
    # packed limb is the inverse permutation with the result in tow
    s_cidx = s_packed >> 1
    limb = (s_cidx.astype(jnp.int64) << 32) | (
        (matched_sorted + 1).astype(jnp.int64))
    (limb,) = jax.lax.sort((limb,), num_keys=1, is_stable=False)
    match = (limb & 0xFFFFFFFF).astype(jnp.int32)[nb:] - 1

    any_null = jnp.zeros(np_, dtype=jnp.bool_)
    for v in probe_valids:
        any_null = any_null | ~v
    return jnp.where(probe_live & ~any_null, match, -1)


@jax.jit
def merge_full_unique(build_keys: Tuple[jax.Array, ...],
                      build_valids: Tuple[jax.Array, ...],
                      build_live: jax.Array,
                      probe_keys: Tuple[jax.Array, ...],
                      probe_valids: Tuple[jax.Array, ...],
                      probe_live: jax.Array
                      ) -> Tuple[jax.Array, jax.Array]:
    """FULL OUTER variant: (per-probe match index or -1, per-build matched).

    Null keys on EITHER side route to distinct sentinels (null build keys
    to DEAD, null probe keys to DEAD-1) so a valid build row's run contains
    only valid live probes — which makes `build row matched iff its run has
    >1 element` exact. (Reference: DataFusion JoinType::Full under
    Ballista's HashJoinExec delegation, SURVEY.md §1 engine kernel.)"""
    nb = build_keys[0].shape[0]
    np_ = probe_keys[0].shape[0]
    n = nb + np_
    DEAD = jnp.int64(2**62)

    b_norm = _norm_keys(build_keys, build_valids)
    p_norm = _norm_keys(probe_keys, probe_valids)
    b_any_null = jnp.zeros(nb, dtype=jnp.bool_)
    for v in build_valids:
        b_any_null = b_any_null | ~v
    p_any_null = jnp.zeros(np_, dtype=jnp.bool_)
    for v in probe_valids:
        p_any_null = p_any_null | ~v
    b_ok = build_live & ~b_any_null
    p_ok = probe_live & ~p_any_null
    comb = [jnp.concatenate([jnp.where(b_ok, bk, DEAD),
                             jnp.where(p_ok, pk, DEAD - 1)])
            for bk, pk in zip(b_norm, p_norm)]
    is_build = jnp.concatenate([b_ok, jnp.zeros(np_, dtype=jnp.bool_)])

    s_keys, s_packed = _cosort(comb, is_build, n)
    pos, first = _runs(s_keys, n)
    s_build = (s_packed & 1).astype(jnp.bool_)

    head, _ = _run_head_fill(pos, first, s_packed.astype(jnp.int64), n)
    head_is_build = (head & 1).astype(jnp.bool_)
    matched_sorted = jnp.where(head_is_build,
                               (head >> 1).astype(jnp.int32), -1)

    # a (unique) build row is matched iff its run has a second element —
    # builds precede probes, so that element is one of its probes
    next_in_run = jnp.concatenate([~first[1:], jnp.zeros(1, jnp.bool_)])
    build_matched_sorted = s_build & next_in_run

    # route back with ONE single-operand int64 sort:
    # cidx<<33 | (match+1)<<1 | build_matched (cidx < 2^30)
    s_cidx = s_packed >> 1
    limb = ((s_cidx.astype(jnp.int64) << 33)
            | ((matched_sorted + 1).astype(jnp.int64) << 1)
            | build_matched_sorted.astype(jnp.int64))
    (limb,) = jax.lax.sort((limb,), num_keys=1, is_stable=False)
    match = jnp.where(p_ok,
                      ((limb >> 1) & 0xFFFFFFFF).astype(jnp.int32)[nb:] - 1,
                      -1)
    build_matched = (limb & 1).astype(jnp.bool_)[:nb] & b_ok
    return match, build_matched
