"""Expanding hash join: non-unique build keys, vectorized (no loops, no
scatters, no hash tables).

Co-sort formulation (see also ops/merge_join.py): concatenate build and
probe keys and sort once — stable + build-first concat order means each
equal-key run lists its build rows, then its probe rows. Per probe row:

  n_matches   = number of build rows in its run  (= segmented count of
                builds before it, since builds precede probes)
  first_build = sorted position of the run's first build row (segmented
                forward fill)

A prefix-sum over per-probe counts assigns output slots; output slot j
recovers its (probe row, k-th build row) with one searchsorted + gathers.
Static output capacity with an overflow flag for the retry driver
(capacity-with-overflow-retry, SURVEY.md §7 hard parts).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .hash import _norm_keys


class ExpandedMatch(NamedTuple):
    probe_row: jax.Array    # (OUT_CAP,) int32 probe row per output slot
    build_row: jax.Array    # (OUT_CAP,) int32 build row (-1 for outer miss)
    valid: jax.Array        # (OUT_CAP,) bool live output slot
    total: jax.Array        # () int32 total output rows (clipped)
    overflow: jax.Array     # () bool
    build_matched: jax.Array  # (NB,) bool — build row matched >=1 probe
                              # (feeds FULL OUTER's unmatched-build append)


@partial(jax.jit, static_argnames=("table_size", "out_capacity", "left_outer"))
def expand_join(build_keys: Tuple[jax.Array, ...],
                build_valids: Tuple[jax.Array, ...],
                build_live: jax.Array,
                probe_keys: Tuple[jax.Array, ...],
                probe_valids: Tuple[jax.Array, ...],
                probe_live: jax.Array,
                table_size: int, out_capacity: int,
                left_outer: bool = False) -> ExpandedMatch:
    # table_size retained for signature compatibility; unused (no table).
    nb = build_keys[0].shape[0]
    np_ = probe_keys[0].shape[0]
    n = nb + np_
    DEAD = jnp.int64(2**62)

    b_norm = _norm_keys(build_keys, build_valids)
    p_norm = _norm_keys(probe_keys, probe_valids)
    # null probe keys never match: normalize them to a distinct sentinel
    p_any_null = jnp.zeros(np_, dtype=jnp.bool_)
    for v in probe_valids:
        p_any_null = p_any_null | ~v
    comb = [jnp.concatenate([jnp.where(build_live, bk, DEAD),
                             jnp.where(probe_live & ~p_any_null, pk, DEAD - 1)])
            for bk, pk in zip(b_norm, p_norm)]
    # null BUILD keys never match either
    b_any_null = jnp.zeros(nb, dtype=jnp.bool_)
    for v in build_valids:
        b_any_null = b_any_null | ~v
    comb[0] = jnp.concatenate([
        jnp.where(build_live & ~b_any_null, comb[0][:nb], DEAD),
        comb[0][nb:]])
    is_build = jnp.concatenate([build_live & ~b_any_null,
                                jnp.zeros(np_, dtype=jnp.bool_)])

    order = jnp.argsort(comb[-1], stable=True)
    for k in reversed(comb[:-1]):
        order = jnp.take(order, jnp.argsort(jnp.take(k, order), stable=True))

    s_keys = [jnp.take(k, order) for k in comb]
    s_build = jnp.take(is_build, order)
    s_orig = jnp.take(jnp.concatenate([
        jnp.arange(nb, dtype=jnp.int32),
        jnp.arange(np_, dtype=jnp.int32)]), order)

    pos = jnp.arange(n, dtype=jnp.int32)
    prev_same = jnp.ones(n, dtype=jnp.bool_)
    for k in s_keys:
        rolled = jnp.concatenate([k[:1], k[:-1]])
        prev_same = prev_same & (k == rolled)
    first_flag = ~prev_same | (pos == 0)

    # Scan-free run machinery (associative_scan costs tens of minutes of
    # TPU compile): builds precede probes within a run, so the run's first
    # element is its first build (if any), and per-position build counts
    # come from cumsum differences against the run start.
    # start_pos per position: running max of first-positions (one cummax
    # pass; an n-sized searchsorted here cost ~2s at 7.5M rows)
    start_pos = jax.lax.cummax(jnp.where(first_flag, pos, 0))
    bsf = jnp.cumsum(s_build.astype(jnp.int32))
    builds_upto = (bsf - jnp.take(bsf, start_pos)
                   + jnp.take(s_build, start_pos).astype(jnp.int32))
    head_is_build = jnp.take(s_build, start_pos)

    # per probe row (original order): count + first build sorted position
    inv = jnp.argsort(order)
    ppos = jnp.take(inv, jnp.arange(nb, n))
    cnt = jnp.take(builds_upto, ppos)            # builds precede probes
    first = jnp.where(jnp.take(head_is_build, ppos),
                      jnp.take(start_pos, ppos), -1)
    cnt = jnp.where((first >= 0) & probe_live & ~p_any_null, cnt, 0)
    if left_outer:
        cnt = jnp.where(probe_live, jnp.maximum(cnt, 1), 0)

    # per-build matched flag: a build row matched iff its run contains >=1
    # probe, i.e. the run's LAST element is a probe (builds precede probes).
    # run_end via one reverse cummin over last-of-run positions (scan-free,
    # same trick family as start_pos above).
    last_flag = jnp.concatenate([first_flag[1:], jnp.ones(1, jnp.bool_)])
    cand = jnp.where(last_flag, pos, n - 1)
    run_end = jnp.flip(jax.lax.cummin(jnp.flip(cand)))
    run_has_probe = ~jnp.take(s_build, run_end)
    build_matched = jnp.take(s_build & run_has_probe, inv[:nb])

    # prefix-sum output slots
    csum = jnp.cumsum(cnt).astype(jnp.int32)
    out_start = jnp.concatenate([jnp.zeros(1, jnp.int32), csum[:-1]])
    total = csum[-1] if np_ else jnp.int32(0)
    overflow = total > out_capacity

    j = jnp.arange(out_capacity, dtype=jnp.int32)
    i = jnp.searchsorted(csum, j, side="right").astype(jnp.int32)
    i = jnp.clip(i, 0, np_ - 1)
    k = j - jnp.take(out_start, i)
    valid = (j < total) & (k >= 0) & (k < jnp.take(cnt, i))
    src_pos = jnp.clip(jnp.take(first, i) + k, 0, n - 1)
    b_row = jnp.take(s_orig, src_pos)
    row_matched = jnp.take(first, i) >= 0
    build_row = jnp.where(valid & row_matched, b_row, -1)
    probe_row = jnp.where(valid, i, -1)
    return ExpandedMatch(probe_row, build_row, valid,
                         jnp.minimum(total, out_capacity), overflow,
                         build_matched)