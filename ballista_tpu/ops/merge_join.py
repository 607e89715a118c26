"""Co-sort merge join: match probe rows to unique-key build rows without
hash tables, scatters, or while_loops.

Motivation (measured, v5e): the open-addressing build loop costs one
450-880 ms scatter per probe iteration, while sorting 7.5M keys costs
~40 ms. So: concatenate build+probe keys, one stable lexicographic sort
(build rows precede probe rows of the same key), then a segmented
forward-fill scan propagates each run's build row index to its probe rows.

Handles multi-key joins and SQL NULL semantics (null keys never match —
masked after the scan). Requires unique build keys (the planner's fast
path; duplicates go through ops.expand_join).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .hash import _norm_keys


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

    # stable lexicographic sort; build rows precede probes of equal keys
    # because they come first in concat order
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
    first = ~prev_same | (pos == 0)

    # Key insight (no scans needed): within a run, build rows precede probe
    # rows (concat order + stable sort), so a run has a build match iff its
    # FIRST element is a build row; start_pos per position is the running
    # max of first-positions — one cummax pass. (associative_scan here cost
    # tens of minutes of TPU compile; an n-sized searchsorted ~2s runtime.)
    start_pos = jax.lax.cummax(jnp.where(first, pos, 0))
    head_is_build = jnp.take(s_build, start_pos)
    matched_sorted = jnp.where(head_is_build, jnp.take(s_orig, start_pos), -1)

    # route results back to original probe positions via the inverse perm
    inv = jnp.argsort(order)
    probe_positions = jnp.take(inv, jnp.arange(nb, n))
    match = jnp.take(matched_sorted, probe_positions)

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

    Same co-sort structure as merge_probe_unique, but null keys on EITHER
    side are routed to distinct sentinels (null build keys to DEAD, null
    probe keys to DEAD-1) so a valid build row's run contains only valid
    live probes — which makes `build row matched iff its run has >1 element`
    exact. The per-build flag feeds the unmatched-build append of FULL
    OUTER JOIN (reference: DataFusion JoinType::Full under Ballista's
    HashJoinExec delegation, SURVEY.md §1 engine kernel)."""
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
    first = ~prev_same | (pos == 0)

    start_pos = jax.lax.cummax(jnp.where(first, pos, 0))
    head_is_build = jnp.take(s_build, start_pos)
    matched_sorted = jnp.where(head_is_build, jnp.take(s_orig, start_pos), -1)

    inv = jnp.argsort(order)
    probe_positions = jnp.take(inv, jnp.arange(nb, n))
    match = jnp.take(matched_sorted, probe_positions)
    match = jnp.where(p_ok, match, -1)

    # a (unique) build row is matched iff its run has a second element —
    # builds precede probes, so that element is one of its probes
    next_in_run = jnp.concatenate([~first[1:], jnp.zeros(1, jnp.bool_)])
    build_matched_sorted = s_build & next_in_run
    build_matched = jnp.take(build_matched_sorted, inv[:nb])
    return match, build_matched & b_ok
