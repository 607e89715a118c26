"""Expanding hash join: non-unique build keys, vectorized (no loops, no
scatters, no hash tables).

Co-sort formulation (see also ops/merge_join.py): concatenate build and
probe keys and sort once — stable + build-first concat order means each
equal-key run lists its build rows, then its probe rows. Per probe row:

  n_matches   = number of build rows in its run  (= segmented count of
                builds before it, since builds precede probes)
  first_build = sorted position of the run's first build row

A prefix-sum over per-probe counts assigns output slots; output slot j
recovers its (probe row, k-th build row) with one searchsorted + gathers.
Static output capacity with an overflow flag for the retry driver
(capacity-with-overflow-retry, SURVEY.md §7 hard parts).

Data movement is variadic-sort-first (ops/vsort.py): payloads ride the
key sort, run-head/run-end lookups are cummax forward-fills (no gathers —
merge_join._run_head_fill), per-probe quantities route back through a
second sort keyed by concat index, and the output-slot epilogue packs
(cnt, first) into one gather.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .hash import _norm_keys
from .merge_join import _cosort, _run_head_fill, _runs


class ExpandedMatch(NamedTuple):
    probe_row: jax.Array    # (OUT_CAP,) int32 probe row per output slot
    build_row: jax.Array    # (OUT_CAP,) int32 build row (-1 for outer miss)
    valid: jax.Array        # (OUT_CAP,) bool live output slot
    total: jax.Array        # () int32 total output rows (clipped)
    overflow: jax.Array     # () bool
    build_matched: jax.Array  # (NB,) bool — build row matched >=1 probe
                              # (feeds FULL OUTER's unmatched-build append)


@partial(jax.jit, static_argnames=("table_size", "out_capacity",
                                   "left_outer", "lo", "key_bits"))
def expand_join(build_keys: Tuple[jax.Array, ...],
                build_valids: Tuple[jax.Array, ...],
                build_live: jax.Array,
                probe_keys: Tuple[jax.Array, ...],
                probe_valids: Tuple[jax.Array, ...],
                probe_live: jax.Array,
                table_size: int, out_capacity: int,
                left_outer: bool = False,
                lo=None, key_bits=None) -> ExpandedMatch:
    # table_size retained for signature compatibility; unused (no table).
    nb = build_keys[0].shape[0]
    np_ = probe_keys[0].shape[0]
    n = nb + np_
    DEAD = jnp.int64(2**62)

    p_any_null = jnp.zeros(np_, dtype=jnp.bool_)
    for v in probe_valids:
        p_any_null = p_any_null | ~v
    b_any_null = jnp.zeros(nb, dtype=jnp.bool_)
    for v in build_valids:
        b_any_null = b_any_null | ~v
    b_ok = build_live & ~b_any_null
    p_ok = probe_live & ~p_any_null
    if lo is not None and len(build_keys) == 1:
        # bounded single key: key + concat-index + build flag share ONE
        # sort operand (concat order in the low bits = implicit
        # stability; see merge_join.merge_probe_unique_packed). Sentinel
        # slots: 2^kb-2 = dead/null probe, 2^kb-1 = dead/null build.
        ib = (2 * n + 1).bit_length()
        psent = (jnp.int64(1) << key_bits) - 2
        bsent = psent + 1
        bslot = jnp.where(b_ok, build_keys[0].astype(jnp.int64) - lo, bsent)
        pslot = jnp.where(p_ok, probe_keys[0].astype(jnp.int64) - lo, psent)
        cidx64 = jnp.arange(n, dtype=jnp.int64)
        comb_limb = ((jnp.concatenate([bslot, pslot]) << ib)
                     | (cidx64 << 1)
                     | jnp.concatenate([b_ok, jnp.zeros(np_, jnp.bool_)]
                                       ).astype(jnp.int64))
        (sl,) = jax.lax.sort((comb_limb,), num_keys=1, is_stable=False)
        s_keys = [sl >> ib]
        s_packed = (sl & ((jnp.int64(1) << ib) - 1)).astype(jnp.int32)
    else:
        b_norm = _norm_keys(build_keys, build_valids)
        p_norm = _norm_keys(probe_keys, probe_valids)
        # null probe keys never match: normalize to distinct sentinels
        comb = [jnp.concatenate([jnp.where(b_ok, bk, DEAD),
                                 jnp.where(p_ok, pk, DEAD - 1)])
                for bk, pk in zip(b_norm, p_norm)]
        is_build = jnp.concatenate([b_ok, jnp.zeros(np_, dtype=jnp.bool_)])
        s_keys, s_packed = _cosort(comb, is_build, n)
    s_build = (s_packed & 1).astype(jnp.bool_)
    s_cidx = s_packed >> 1
    pos, first_flag = _runs(s_keys, n)

    # builds precede probes within a run: per-position build count =
    # cumsum difference against the run start (the start's own flag added
    # back); run-head build flag + start position via ONE cummax
    # forward-fill (_run_head_fill — no gather)
    bsf = jnp.cumsum(s_build.astype(jnp.int32))
    packed = (bsf.astype(jnp.int64) << 1) | s_build.astype(jnp.int64)
    head, start_pos = _run_head_fill(pos, first_flag, packed, n)
    head_bsf = (head >> 1).astype(jnp.int32)
    head_is_build = (head & 1).astype(jnp.bool_)
    builds_upto = bsf - head_bsf + head_is_build.astype(jnp.int32)

    # per-build matched flag: a build row matched iff its run contains >=1
    # probe, i.e. the run's LAST element is a probe (builds precede
    # probes). Same fill trick run backward: tag run ENDS with their
    # reversed position, forward cummax over the flipped arrays, low bit.
    last_flag = jnp.concatenate([first_flag[1:], jnp.ones(1, jnp.bool_)])
    tagged_r = jnp.where(
        jnp.flip(last_flag),
        (pos.astype(jnp.int64) << 1) | jnp.flip(s_build).astype(jnp.int64),
        jnp.int64(0))
    run_end_is_build = jnp.flip(
        (jax.lax.cummax(tagged_r) & 1).astype(jnp.bool_))
    run_has_probe = ~run_end_is_build
    build_matched_sorted = (s_build & run_has_probe).astype(jnp.int32)

    # per-position run data routes back to original rows with one
    # 2-operand sort: int32 cidx key + ONE packed int64 payload
    # (builds_upto << fb+1 | first+1 << 1 | matched) — sort compile time
    # is superlinear in operand count (was 4 operands)
    first_sorted = jnp.where(head_is_build, start_pos, -1)
    fb = (n + 1).bit_length()
    pay = ((builds_upto.astype(jnp.int64) << (fb + 1))
           | ((first_sorted + 1).astype(jnp.int64) << 1)
           | build_matched_sorted.astype(jnp.int64))
    back = jax.lax.sort((s_cidx, pay), num_keys=1, is_stable=False)
    cnt = (back[1][nb:] >> (fb + 1)).astype(jnp.int32)
    first = (((back[1][nb:] >> 1)
              & ((jnp.int64(1) << fb) - 1)).astype(jnp.int32) - 1)
    build_matched = (back[1][:nb] & 1).astype(jnp.bool_)

    cnt = jnp.where((first >= 0) & p_ok, cnt, 0)
    if left_outer:
        cnt = jnp.where(probe_live, jnp.maximum(cnt, 1), 0)

    # prefix-sum output slots
    csum = jnp.cumsum(cnt).astype(jnp.int32)
    out_start = jnp.concatenate([jnp.zeros(1, jnp.int32), csum[:-1]])
    total = csum[-1] if np_ else jnp.int32(0)
    overflow = total > out_capacity

    from .vsort import rank_in_sorted
    j = jnp.arange(out_capacity, dtype=jnp.int32)
    i = rank_in_sorted(csum, out_capacity)
    i = jnp.clip(i, 0, np_ - 1)
    # (cnt, first+1) share one packed gather (per-column 6M gathers are
    # ~90ms on v5e; packing halves the epilogue's gather count)
    fb = (n + 1).bit_length()
    pk = (cnt.astype(jnp.int64) << fb) | (first + 1).astype(jnp.int64)
    g = jnp.take(pk, i)
    cnt_i = (g >> fb).astype(jnp.int32)
    first_i = (g & ((1 << fb) - 1)).astype(jnp.int32) - 1
    k = j - jnp.take(out_start, i)
    valid = (j < total) & (k >= 0) & (k < cnt_i)
    src_pos = jnp.clip(first_i + k, 0, n - 1)
    b_row = jnp.take(s_cidx, src_pos)  # build rows carry their own index
    row_matched = first_i >= 0
    build_row = jnp.where(valid & row_matched, b_row, -1)
    probe_row = jnp.where(valid, i, -1)
    return ExpandedMatch(probe_row, build_row, valid,
                         jnp.minimum(total, out_capacity), overflow,
                         build_matched)
