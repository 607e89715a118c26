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
    # static packing metadata (sort compile time is superlinear in operand
    # count): code_bound = exclusive code upper bound (dict/bool columns);
    # narrow = 32-bit integer/date column (packs as a biased 33-bit field);
    # lo/hi = ingest-time value bounds (schema.int_bounds)
    code_bound: int | None = None
    narrow: bool = False
    lo: int | None = None
    hi: int | None = None


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


def _packed_field(col: Column, spec: SortKeySpec):
    """(bits, non-negative order-preserving int64) for a statically
    bounded key, or None. Value layout inside `bits`: nulls take slot 0
    (nulls first) or the top slot (nulls last); descending reverses the
    code range. Lexicographic order of concatenated fields == multi-key
    sort order, so consecutive bounded keys share one int64 operand."""
    nulls_first = spec.nulls_first
    if nulls_first is None:
        nulls_first = not spec.ascending
    if spec.code_bound is not None:
        B = int(spec.code_bound)
        code = jnp.clip(col.data.astype(jnp.int64), 0, B - 1)
        if not spec.ascending:
            code = (B - 1) - code
        val = jnp.where(col.validity,
                        code + (1 if nulls_first else 0),
                        jnp.int64(0 if nulls_first else B))
        return (B + 1).bit_length(), val
    if spec.lo is not None and spec.hi is not None:
        span = int(spec.hi) - int(spec.lo)
        # round width to 4-bit multiples: compiled programs survive
        # modest data growth (bounds are compile-time constants)
        bits = max((((span + 2).bit_length() + 3) // 4) * 4, 4)
        if bits <= 62:
            v = col.data.astype(jnp.int64) - jnp.int64(spec.lo)
            if not spec.ascending:
                v = span - v
            val = jnp.where(col.validity,
                            v + (1 if nulls_first else 0),
                            jnp.int64(0 if nulls_first else span + 1))
            return bits, val
    if spec.narrow:
        v = col.data.astype(jnp.int64) + (jnp.int64(1) << 31)  # [0, 2^32)
        if not spec.ascending:
            v = ((jnp.int64(1) << 32) - 1) - v
        val = jnp.where(col.validity,
                        v + (1 if nulls_first else 0),
                        jnp.int64(0) if nulls_first
                        else (jnp.int64(1) << 32) + 1)
        return 34, val
    return None


def sort_batch(batch: Batch, keys: Sequence[SortKeySpec]) -> Batch:
    """Variadic sort: all columns ride the key sort (ops/vsort.py) —
    liveness is the most-significant key so dead rows sink to the back.
    Consecutive statically-bounded keys (dict codes, 32-bit ints/dates)
    pack into shared int64 limbs, and the liveness bit rides the first
    packed limb: sort compile time is superlinear in operand count."""
    from .vsort import sort_batch_columns
    live = row_mask(batch)
    ranks = []
    group_bits = 0
    group_val = None
    live_pending = True  # fold ~live into the first packed group

    def flush():
        nonlocal group_bits, group_val
        if group_val is not None:
            ranks.append(group_val)
            group_bits, group_val = 0, None

    for spec in keys:
        col = batch.columns[spec.col_index]
        f = _packed_field(col, spec)
        if f is None:
            if live_pending:
                # unbounded first key: liveness stays its own operand
                ranks.insert(0, ~live)
            flush()
            ranks.append(_rankable(col.data, col.validity, spec))
            live_pending = False
            continue
        bits, val = f
        if group_val is not None and group_bits + bits > 62:
            flush()
        if group_val is None:
            lead = ((~live).astype(jnp.int64) if live_pending
                    else jnp.int64(0))
            group_val = (lead << bits) | val
            group_bits = bits + (1 if live_pending else 0)
            live_pending = False
        else:
            group_val = (group_val << bits) | val
            group_bits += bits
    if live_pending:
        ranks.insert(0, ~live)
    flush()
    out, _, _ = sort_batch_columns(tuple(ranks), batch)
    return out
