"""Expanding hash join: non-unique build keys, vectorized (no per-row loops).

Reference parity: DataFusion's hash join handles duplicate build keys via
per-bucket chains walked row-by-row. On TPU we restructure:

  1. sort build rows by key -> equal keys form contiguous runs
  2. run heads (first row of each run) have UNIQUE keys -> standard
     open-addressing table maps key -> head position (== run start)
  3. probe rows look up (start, len); match counts prefix-sum into output
     offsets
  4. every output slot j finds its (probe row, k-th match) pair with one
     searchsorted over the cumulative offsets — a pure gather, parallel

Output capacity is static; `total > capacity` raises the overflow flag so
the driver retries with a bigger capacity (capacity-with-overflow-retry,
SURVEY.md §7 hard parts).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .hash import _norm_keys, group_codes, probe_join_table


class ExpandedMatch(NamedTuple):
    probe_row: jax.Array    # (OUT_CAP,) int32 probe row per output slot
    build_row: jax.Array    # (OUT_CAP,) int32 build row (-1 for outer miss)
    valid: jax.Array        # (OUT_CAP,) bool live output slot
    total: jax.Array        # () int32 total output rows (pre-clip)
    overflow: jax.Array     # () bool


@partial(jax.jit, static_argnames=("table_size", "out_capacity", "left_outer"))
def expand_join(build_keys: Tuple[jax.Array, ...],
                build_valids: Tuple[jax.Array, ...],
                build_live: jax.Array,
                probe_keys: Tuple[jax.Array, ...],
                probe_valids: Tuple[jax.Array, ...],
                probe_live: jax.Array,
                table_size: int, out_capacity: int,
                left_outer: bool = False) -> ExpandedMatch:
    n_build = build_keys[0].shape[0]
    n_probe = probe_keys[0].shape[0]
    pos = jnp.arange(n_build, dtype=jnp.int32)

    # 1. sort build rows by normalized keys, dead rows last (lexicographic:
    # stable passes from least- to most-significant key)
    norm = _norm_keys(build_keys, build_valids)
    DEAD = jnp.int64(2**62)
    order = jnp.argsort(jnp.where(build_live, norm[-1], DEAD), stable=True)
    for k in reversed(norm[:-1]):
        key = jnp.take(jnp.where(build_live, k, DEAD), order)
        order = jnp.take(order, jnp.argsort(key, stable=True))
    s_live = jnp.take(build_live, order)
    s_norm = [jnp.take(k, order) for k in norm]

    # 2. run detection over sorted rows
    prev_same = jnp.ones(n_build, dtype=jnp.bool_)
    for k in s_norm:
        rolled = jnp.concatenate([k[:1], k[:-1]])
        prev_same = prev_same & (k == rolled)
    first = s_live & (~prev_same | (pos == 0))
    run_id = jnp.cumsum(first.astype(jnp.int32)) - 1
    run_len = jnp.zeros(n_build + 1, dtype=jnp.int32).at[
        jnp.where(s_live, run_id, n_build)].add(1)[:n_build]  # per run id

    # 3. unique-key table over run heads; slot_row == head sorted position
    ones = tuple(jnp.ones(n_build, dtype=jnp.bool_) for _ in s_norm)
    gt = group_codes(tuple(s_norm), ones, first, table_size)

    # 4. probe for head positions
    any_null = jnp.zeros(n_probe, dtype=jnp.bool_)
    for v in probe_valids:
        any_null = any_null | ~v
    p_norm = _norm_keys(probe_keys, probe_valids)
    m = probe_join_table(gt.slot_used, gt.slot_row,
                         tuple(s_norm), ones,
                         tuple(p_norm), tuple(jnp.ones(n_probe, jnp.bool_) for _ in p_norm),
                         probe_live & ~any_null, table_size)
    matched = m >= 0
    head_pos = jnp.clip(m, 0, n_build - 1)             # == run start
    rid = jnp.take(run_id, head_pos)
    cnt = jnp.where(matched, jnp.take(run_len, jnp.clip(rid, 0, n_build - 1)), 0)
    if left_outer:
        cnt = jnp.where(probe_live, jnp.maximum(cnt, 1), 0)

    # 5. offsets
    csum = jnp.cumsum(cnt).astype(jnp.int32)
    out_start = jnp.concatenate([jnp.zeros(1, jnp.int32), csum[:-1]])
    total = csum[-1] if n_probe else jnp.int32(0)
    overflow = (total > out_capacity) | gt.overflow

    # 6. slot j -> (probe row i, k-th match): i = first row whose end > j
    j = jnp.arange(out_capacity, dtype=jnp.int32)
    i = jnp.searchsorted(csum, j, side="right").astype(jnp.int32)
    i = jnp.clip(i, 0, n_probe - 1)
    k = j - jnp.take(out_start, i)
    valid = (j < total) & (k >= 0) & (k < jnp.take(cnt, i))
    srt_pos = jnp.clip(jnp.take(head_pos, i) + k, 0, n_build - 1)
    b_row = jnp.take(order, srt_pos)
    row_matched = jnp.take(matched, i)
    build_row = jnp.where(valid & row_matched, b_row, -1)
    probe_row = jnp.where(valid, i, -1)
    return ExpandedMatch(probe_row, build_row, valid,
                         jnp.minimum(total, out_capacity), overflow)
