"""Row compaction / gather primitives.

Filtering on TPU keeps fixed shapes: a predicate produces a keep-mask, and
`compact` moves kept rows to the front (stable) via an argsort permutation,
updating num_rows. This replaces DataFusion's `FilterExec`+`take` kernels
with shape-static device ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..batch import Batch, Column, row_mask


def compaction_perm(keep: jax.Array):
    """Stable permutation putting keep=True rows first; returns (perm, count)."""
    # argsort of (!keep) is stable in JAX -> kept rows keep relative order
    perm = jnp.argsort(~keep, stable=True)
    return perm, jnp.sum(keep).astype(jnp.int32)


def gather_batch(batch: Batch, perm: jax.Array, num_rows: jax.Array,
                 valid: jax.Array | None = None) -> Batch:
    """Reorder all columns by perm; optionally AND validity with `valid[perm]`.
    One packed 2D row-gather per byte-width class (ops/gather.py)."""
    from .gather import gather_columns
    vperm = None if valid is None else jnp.take(valid, perm, mode="clip")
    cols = gather_columns(batch.columns, perm, valid_and=vperm)
    return Batch(tuple(cols), num_rows.astype(jnp.int32))


def filter_batch(batch: Batch, mask_col: Column) -> Batch:
    """Apply a boolean predicate column: keep rows where value is true and
    valid (SQL WHERE drops NULL predicates). Compaction rides a variadic
    sort — 6-8x cheaper than argsort+gather on TPU (ops/vsort.py)."""
    from .vsort import compact_batch
    keep = mask_col.data.astype(jnp.bool_) & mask_col.validity & row_mask(batch)
    return compact_batch(batch, keep)


def limit_batch(batch: Batch, n: int) -> Batch:
    new_rows = jnp.minimum(batch.num_rows, jnp.int32(n))
    live = jnp.arange(batch.capacity, dtype=jnp.int32) < new_rows
    cols = [Column(c.data, c.validity & live) for c in batch.columns]
    return Batch(tuple(cols), new_rows)
