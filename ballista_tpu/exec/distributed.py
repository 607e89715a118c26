"""Distributed operators: stage boundaries as in-program collectives.

Reference parity: Ballista's distributed operators
(`core/src/execution_plans/`): ShuffleWriterExec -> ExchangeExec (all_to_all
fused at the producer stage's root), ShuffleReaderExec/UnresolvedShuffleExec
-> StageInputLeaf (bound to the producer's sharded output, no files/Flight),
CoalescePartitionsExec -> GatherExec (all_gather merge).

These nodes only evaluate inside a shard_map over the partition mesh axis;
`scheduler.runtime` wraps each stage with shard_map + jit.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..batch import Batch, Column
from ..schema import Schema
from ..parallel.mesh import PARTITION_AXIS
from ..parallel.shuffle import all_gather_batch, hash_partition_exchange
from .plan import ExecNode, InputLeaf


class _PartitionCtx:
    """Serial (out-of-core) runtime: the partition id of the shard being
    traced, as a scalar program argument. None outside the serial runtime
    (mesh programs read jax.lax.axis_index instead)."""
    pid = None

    def __init__(self, pid):
        self._pid = pid

    def __enter__(self):
        _PartitionCtx.pid = self._pid
        return self

    def __exit__(self, *exc):
        _PartitionCtx.pid = None


class _TraceCtx:
    """Collects per-stage side outputs during tracing: overflow flags and
    per-operator output row counts (the reference ships per-operator
    metric sets in TaskStatus, proto:286-319 — here they ride along as
    scalar outputs of the stage program)."""
    _current: Optional["_TraceCtx"] = None

    def __init__(self):
        self.overflow: List[jax.Array] = []
        self.op_rows: List[tuple] = []   # (label, traced int32 rows)
        # shuffle-write stats (PartitionStats, serde/scheduler/mod.rs:33):
        # (quota, salt_kind|None, traced pre-clamp (P,) dest counts)
        self.exchanges: List[tuple] = []

    def __enter__(self):
        _TraceCtx._current = self
        return self

    def __exit__(self, *exc):
        _TraceCtx._current = None

    @classmethod
    def record_overflow(cls, flag):
        if cls._current is not None:
            cls._current.overflow.append(flag)

    @classmethod
    def record_rows(cls, label: str, num_rows):
        if cls._current is not None:
            cls._current.op_rows.append((label, num_rows))

    @classmethod
    def record_exchange(cls, quota: int, salt_kind, counts):
        if cls._current is not None:
            cls._current.exchanges.append((quota, salt_kind, counts))


class ExchangeExec(ExecNode):
    """Hash-repartition the child's rows across the mesh (ShuffleWriterExec
    hash path, `shuffle_writer.rs:328-449`, as a fused all_to_all)."""

    def __init__(self, child: ExecNode, key_names: Sequence[str],
                 n_parts: int, quota: int,
                 salt: int = 1, salt_mode: str | None = None,
                 salt_kind: str | None = None):
        self.children = (child,)
        self.key_names = tuple(key_names)
        self.n_parts = n_parts
        self.quota = quota
        # skewed-key splitting: salt>1 spreads each key over `salt`
        # destinations ('spread' probe side / 'replicate' build side)
        self.salt = salt
        self.salt_mode = salt_mode
        # what salting a RETRY would apply to this exchange ('spread' /
        # 'replicate' for join sides, None for plain repartitions) — the
        # overflow-stats handler uses it to pick salt vs quota
        self.salt_kind = salt_kind if salt_kind is not None else salt_mode
        self.schema = child.schema
        self.capacity = n_parts * quota
        self._key_idx = [child.schema.index_of(k) for k in key_names]

    def evaluate(self, inputs):
        b = self.children[0].evaluate(inputs)
        out, overflow, counts = hash_partition_exchange(
            b, self._key_idx, self.n_parts, self.quota, PARTITION_AXIS,
            salt=self.salt, salt_mode=self.salt_mode)
        _TraceCtx.record_overflow(overflow)
        _TraceCtx.record_exchange(self.quota, self.salt_kind, counts)
        return out

    def _label(self):
        s = f", salt={self.salt}:{self.salt_mode}" if self.salt > 1 else ""
        return (f"ExchangeExec(keys={list(self.key_names)}, "
                f"P={self.n_parts}, q={self.quota}{s})")


class GatherExec(ExecNode):
    """All-gather every shard's rows onto every shard (CoalescePartitionsExec
    / broadcast build side)."""

    def __init__(self, child: ExecNode, n_parts: int):
        self.children = (child,)
        self.n_parts = n_parts
        self.schema = child.schema
        self.capacity = n_parts * child.capacity

    def evaluate(self, inputs):
        b = self.children[0].evaluate(inputs)
        return all_gather_batch(b, self.n_parts, PARTITION_AXIS)

    def _label(self):
        return f"GatherExec(P={self.n_parts})"


class PartitionPruneExec(ExecNode):
    """Keep rows only on shard 0 (after a gather, makes the final stage's
    result live on a single logical partition, like Ballista's final merge
    stage having one output partition)."""

    def __init__(self, child: ExecNode):
        self.children = (child,)
        self.schema = child.schema
        self.capacity = child.capacity

    def evaluate(self, inputs):
        b = self.children[0].evaluate(inputs)
        # serial (out-of-core) runtime traces outside shard_map and passes
        # the partition id as a scalar argument instead of axis_index
        my = (_PartitionCtx.pid if _PartitionCtx.pid is not None
              else jax.lax.axis_index(PARTITION_AXIS))
        keep = my == 0
        n = jnp.where(keep, b.num_rows, 0).astype(jnp.int32)
        live = jnp.arange(b.capacity, dtype=jnp.int32) < n
        cols = [Column(c.data, c.validity & live) for c in b.columns]
        return Batch(tuple(cols), n)

    def _label(self):
        return "PartitionPruneExec(shard0)"
