"""Partitioned (sharded) batches: a Batch with a leading partition axis,
sharded over the mesh's partition axis.

Reference parity: a Ballista table scan's partitions (one file-partition per
task); here each mesh shard owns row-range partition i, stored as device
arrays with shape (P, cap_per_shard) laid out so shard i holds row block i.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..batch import Batch, Column, round_capacity
from ..schema import Schema
from .mesh import PARTITION_AXIS


class PartitionedBatch(NamedTuple):
    """columns[i].data: (P, cap) arrays; num_rows: (P,) int32 per shard."""
    columns: Tuple[Column, ...]
    num_rows: jax.Array

    @property
    def n_partitions(self) -> int:
        return int(self.columns[0].data.shape[0])

    @property
    def capacity(self) -> int:
        return int(self.columns[0].data.shape[1])


def shard_batch_sharding(mesh):
    return NamedSharding(mesh, P(PARTITION_AXIS))


def partition_arrow(table, n_partitions: int, mesh=None,
                    capacity: int | None = None):
    """Split a pyarrow table row-wise into P shards -> PartitionedBatch.

    Row order is preserved across shard boundaries (shard i gets rows
    [i*rows/P, (i+1)*rows/P)) — same contract as Ballista CSV partition
    splits.
    """
    from ..batch import compute_dictionaries, from_arrow

    n = table.num_rows
    per = -(-n // n_partitions)
    cap = round_capacity(max(per, 1) if capacity is None else capacity)
    # one GLOBAL dictionary per string column so all shards' codes agree
    global_dicts = compute_dictionaries(table)
    shard_cols = None
    schema = None
    num_rows = np.zeros(n_partitions, dtype=np.int32)
    for p in range(n_partitions):
        chunk = table.slice(p * per, per)
        b, s = from_arrow(chunk, capacity=cap, dictionaries=global_dicts)
        if schema is None:
            schema = s
            shard_cols = [([], []) for _ in b.columns]
        num_rows[p] = chunk.num_rows
        for i, c in enumerate(b.columns):
            shard_cols[i][0].append(np.asarray(c.data))
            shard_cols[i][1].append(np.asarray(c.validity))
    cols = []
    sharding = shard_batch_sharding(mesh) if mesh is not None else None

    def put(a):
        if sharding is None:
            return jnp.asarray(a)
        # make_array_from_callback works for cross-process meshes too: each
        # process materializes only the shards it owns (multi-host parity:
        # an executor writes only its own partitions)
        return jax.make_array_from_callback(a.shape, sharding,
                                            lambda idx: a[idx])

    for datas, valids in shard_cols:
        cols.append(Column(put(np.stack(datas)), put(np.stack(valids))))
    nr = put(num_rows)
    return PartitionedBatch(tuple(cols), nr), schema


def gather_partitions(pb: PartitionedBatch, schema: Schema) -> Batch:
    """Collect all shards into one host-side Batch (result egress — the
    analog of the client Flight-fetching final partitions)."""
    from .multihost import host_local_array

    P_, cap = pb.n_partitions, pb.capacity
    total_cap = round_capacity(P_ * cap)
    nrows = host_local_array(pb.num_rows)
    cols = []
    for c in pb.columns:
        data = host_local_array(c.data)
        valid = host_local_array(c.validity)
        out_d = np.zeros(total_cap, dtype=data.dtype)
        out_v = np.zeros(total_cap, dtype=bool)
        off = 0
        for p in range(P_):
            k = int(nrows[p])
            out_d[off:off + k] = data[p, :k]
            out_v[off:off + k] = valid[p, :k]
            off += k
        cols.append(Column(jnp.asarray(out_d), jnp.asarray(out_v)))
    return Batch(tuple(cols), jnp.int32(int(nrows.sum())))
