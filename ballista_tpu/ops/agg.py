"""Segment (per-group-slot) aggregation primitives.

Given group slots from `ops.hash.group_codes`, aggregates are scatter-adds /
scatter-min/max over the slot axis — XLA lowers these to efficient on-device
segmented reductions. Two-phase aggregation (partial per partition, final
after shuffle) mirrors DataFusion's Partial/Final AggregateExec modes that
Ballista splits stages around (SURVEY.md §3.3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _scatter_idx(row_slot: jax.Array, active: jax.Array, table_size: int):
    """Slot index per row; inactive rows scatter to the overflow slot T."""
    return jnp.where(active & (row_slot >= 0), row_slot, table_size)


def seg_sum(values, validity, row_slot, live, table_size: int):
    active = live & validity
    idx = _scatter_idx(row_slot, active, table_size)
    zero = jnp.zeros(table_size + 1, dtype=values.dtype)
    contrib = jnp.where(active, values, jnp.zeros((), values.dtype))
    total = zero.at[idx].add(contrib)[:table_size]
    cnt = jnp.zeros(table_size + 1, dtype=jnp.int64).at[idx].add(
        jnp.where(active, 1, 0).astype(jnp.int64))[:table_size]
    return total, cnt > 0


def seg_count(values, validity, row_slot, live, table_size: int):
    active = live & validity
    idx = _scatter_idx(row_slot, active, table_size)
    cnt = jnp.zeros(table_size + 1, dtype=jnp.int64).at[idx].add(
        jnp.where(active, 1, 0).astype(jnp.int64))[:table_size]
    return cnt, jnp.ones(table_size, dtype=jnp.bool_)


def seg_count_star(row_slot, live, table_size: int):
    idx = _scatter_idx(row_slot, live, table_size)
    cnt = jnp.zeros(table_size + 1, dtype=jnp.int64).at[idx].add(
        jnp.where(live, 1, 0).astype(jnp.int64))[:table_size]
    return cnt, jnp.ones(table_size, dtype=jnp.bool_)


def seg_min(values, validity, row_slot, live, table_size: int):
    return _seg_extreme(values, validity, row_slot, live, table_size, is_min=True)


def seg_max(values, validity, row_slot, live, table_size: int):
    return _seg_extreme(values, validity, row_slot, live, table_size, is_min=False)


def _seg_extreme(values, validity, row_slot, live, table_size: int, is_min: bool):
    active = live & validity
    idx = _scatter_idx(row_slot, active, table_size)
    if jnp.issubdtype(values.dtype, jnp.floating):
        sentinel = jnp.asarray(jnp.inf if is_min else -jnp.inf, values.dtype)
    else:
        info = jnp.iinfo(values.dtype)
        sentinel = jnp.asarray(info.max if is_min else info.min, values.dtype)
    init = jnp.full(table_size + 1, sentinel, dtype=values.dtype)
    contrib = jnp.where(active, values, sentinel)
    if is_min:
        out = init.at[idx].min(contrib)[:table_size]
    else:
        out = init.at[idx].max(contrib)[:table_size]
    cnt = jnp.zeros(table_size + 1, dtype=jnp.int64).at[idx].add(
        jnp.where(active, 1, 0).astype(jnp.int64))[:table_size]
    return jnp.where(cnt > 0, out, jnp.zeros((), values.dtype)), cnt > 0
