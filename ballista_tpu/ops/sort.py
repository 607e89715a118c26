"""Multi-key sort over fixed-capacity batches.

Reference parity: DataFusion SortExec / SortPreservingMergeExec (the merge
stage Ballista's planner inserts at `planner.rs:101-133`). Implementation:
lexicographic sort = sequence of stable argsorts from least- to
most-significant key (XLA's sort is a fast on-device bitonic/merge sort).
A Pallas LSD radix sort is the planned fast path for large single-key sorts.

Null ordering follows DataFusion defaults: ASC -> NULLS LAST,
DESC -> NULLS FIRST (so nulls are always "largest").
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ..batch import Batch, Column, row_mask
from .compact import gather_batch


class SortKeySpec(NamedTuple):
    col_index: int
    ascending: bool = True
    nulls_first: bool | None = None  # None -> DataFusion default


def sort_perm(batch: Batch, keys: Sequence[SortKeySpec]) -> jax.Array:
    """Permutation sorting live rows by keys; dead rows go last."""
    live = row_mask(batch)
    n = batch.capacity
    perm = jnp.arange(n, dtype=jnp.int32)
    # least-significant key first, each pass stable
    for spec in reversed(list(keys)):
        col = batch.columns[spec.col_index]
        data = jnp.take(col.data, perm, mode="clip")
        valid = jnp.take(col.validity, perm, mode="clip")
        k = _rankable(data, valid, spec)
        order = jnp.argsort(k, stable=True)
        perm = jnp.take(perm, order, mode="clip")
    # dead rows last (stable: previous passes already used -inf/inf trick only
    # for nulls; enforce liveness as the most significant key)
    lv = jnp.take(live, perm, mode="clip")
    order = jnp.argsort(~lv, stable=True)
    return jnp.take(perm, order, mode="clip")


def _rankable(data: jax.Array, valid: jax.Array, spec: SortKeySpec) -> jax.Array:
    """Map a column to a sortable array honoring direction + null placement."""
    nulls_first = spec.nulls_first
    if nulls_first is None:
        nulls_first = not spec.ascending  # DataFusion default
    if jnp.issubdtype(data.dtype, jnp.floating):
        d = data
        d = jnp.where(jnp.isnan(d), jnp.inf, d)  # NaN sorts greatest
        d = d if spec.ascending else -d
        null_val = -jnp.inf if nulls_first else jnp.inf
        return jnp.where(valid, d, null_val)
    d = data.astype(jnp.int64)
    d = d if spec.ascending else -d
    big = jnp.int64(2**62)
    return jnp.where(valid, d, -big if nulls_first else big)


def sort_batch(batch: Batch, keys: Sequence[SortKeySpec]) -> Batch:
    """Variadic sort: all columns ride the key sort (ops/vsort.py) —
    liveness is the most-significant key so dead rows sink to the back."""
    from .vsort import sort_batch_columns
    live = row_mask(batch)
    ranks = [~live]
    for spec in keys:
        col = batch.columns[spec.col_index]
        ranks.append(_rankable(col.data, col.validity, spec))
    out, _, _ = sort_batch_columns(tuple(ranks), batch)
    return out
