"""Stage-output spill: shuffle data that survives executor loss.

Reference parity: the Replicator (`executor/src/replicator/mod.rs:76`)
uploads every shuffle file to object storage so ShuffleReaderExec can fall
back to it when the producing executor dies (`shuffle_reader.rs:395-537`).
Here stage outputs are device arrays, so the spill is a host fetch +
Arrow IPC file per stage under `work_dir/<job_id>/stage_<id>.arrow`
(the reference's shuffle-file layout, `shuffle_writer.rs` path scheme);
restore re-feeds the mesh without re-running the producer chain.

`work_dir` is an object-store URL resolved through the
ObjectStoreRegistry (utils/object_store.py — the reference's
BallistaObjectStoreRegistry, core/src/utils.rs:91): a plain path or
file:// URL spills to local disk, mem:// to the in-process store, and a
registered cloud scheme uploads like the reference's Replicator.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

import pyarrow as pa

from ..parallel.partitioned import PartitionedBatch
from ..parallel.multihost import host_local_array
from ..batch import Column


def encode_stage(pb: PartitionedBatch) -> bytes:
    """Serialize a sharded stage output to one self-describing Arrow IPC
    blob (per-column (P, cap) data + validity planes + per-shard row
    counts in schema metadata) — the spill file format AND the
    peer-to-peer fetch wire format."""
    arrays = {}
    P, cap = pb.n_partitions, pb.capacity
    for i, c in enumerate(pb.columns):
        arrays[f"d{i}"] = host_local_array(c.data).reshape(-1)
        arrays[f"v{i}"] = host_local_array(c.validity).reshape(-1)
    nrows = host_local_array(pb.num_rows).astype("int64").tolist()
    table = pa.table({k: pa.array(v) for k, v in arrays.items()})
    meta = {b"P": str(P).encode(), b"cap": str(cap).encode(),
            b"ncols": str(len(pb.columns)).encode(),
            b"num_rows": ",".join(map(str, nrows)).encode()}
    table = table.replace_schema_metadata(meta)
    sink = pa.BufferOutputStream()
    with pa.ipc.new_file(sink, table.schema) as w:
        w.write_table(table)
    return sink.getvalue().to_pybytes()


def decode_stage(blob: bytes, mesh=None) -> PartitionedBatch:
    """Inverse of encode_stage: rebuild the PartitionedBatch, resharding
    onto `mesh` when given (host arrays otherwise)."""
    table = pa.ipc.open_file(pa.BufferReader(blob)).read_all()
    meta = table.schema.metadata
    P = int(meta[b"P"])
    cap = int(meta[b"cap"])
    ncols = int(meta[b"ncols"])

    def put(a):
        if mesh is None:
            import jax.numpy as jnp
            return jnp.asarray(a)
        import jax
        from ..parallel.partitioned import shard_batch_sharding
        sharding = shard_batch_sharding(mesh)
        return jax.make_array_from_callback(a.shape, sharding,
                                            lambda idx: a[idx])

    cols = []
    for i in range(ncols):
        d = np.asarray(table[f"d{i}"]).reshape(P, cap)
        v = np.asarray(table[f"v{i}"]).reshape(P, cap)
        cols.append(Column(put(d), put(v)))
    nr = put(np.array([int(x) for x in
                       meta[b"num_rows"].decode().split(",")],
                      dtype=np.int32))
    return PartitionedBatch(tuple(cols), nr)


class StageSpiller:
    def __init__(self, work_dir: str, registry=None, version: int = 0):
        from ..utils.object_store import DEFAULT_REGISTRY
        self.work_dir = work_dir
        # job-spec version rides the spill key: after an overflow
        # escalation re-plans a job (rpc.py _escalate_on_overflow bumps
        # the spec version), a straggler executor finishing an OLD-spec
        # task writes old-version keys and can never shadow the re-run
        # stage's new-capacity output (ADVICE r3). Version 0 keeps the
        # flat pre-escalation layout.
        self.version = version
        self.store, self._prefix = \
            (registry or DEFAULT_REGISTRY).resolve(work_dir)

    def _key(self, job_id: str, stage_id: int) -> str:
        v = f"v{self.version}_" if self.version else ""
        base = f"{job_id}/{v}stage_{stage_id}.arrow"
        return f"{self._prefix}/{base}" if self._prefix else base

    def spill(self, job_id: str, stage_id: int, pb: PartitionedBatch):
        """Persist a stage's sharded output: per-column (P, cap) data +
        validity planes plus per-shard row counts, one IPC file."""
        self.store.put(self._key(job_id, stage_id), encode_stage(pb))

    def restore(self, job_id: str, stage_id: int,
                mesh=None) -> Optional[PartitionedBatch]:
        """Reload a spilled stage output onto the mesh (the object-store
        fallback read, shuffle_reader.rs:787-858)."""
        blob = self.store.get(self._key(job_id, stage_id))
        if blob is None:
            return None
        return decode_stage(blob, mesh)

    def read_blob(self, job_id: str, stage_id: int) -> Optional[bytes]:
        """Raw spill bytes for a stage — what the peer-to-peer data
        endpoint serves (flight_service.rs:74 do_get FetchPartition reads
        the producer's local shuffle file the same way)."""
        return self.store.get(self._key(job_id, stage_id))

    def clean_job(self, job_id: str):
        """RemoveJobData parity (executor_server.rs:1210): delete a job's
        spilled objects."""
        prefix = f"{self._prefix}/{job_id}/" if self._prefix \
            else f"{job_id}/"
        for key in list(self.store.list(prefix)):
            self.store.delete(key)

    def clean_expired(self, ttl_seconds: float = 7 * 24 * 3600) -> list:
        """Shuffle-data TTL cleaner parity (clean_shuffle_data_loop,
        executor_process.rs:503; default TTL 7 days): remove job spill
        directories whose newest file is older than the TTL. Returns the
        removed job ids."""
        import time
        now = time.time()
        newest: dict = {}
        for key in list(self.store.list(self._prefix)):
            rel = key[len(self._prefix):].lstrip("/") if self._prefix \
                else key
            job_id = rel.split("/", 1)[0]
            m = self.store.mtime(key) or 0
            newest[job_id] = max(newest.get(job_id, 0), m)
        removed = [j for j, m in newest.items() if now - m > ttl_seconds]
        for j in removed:
            self.clean_job(j)
        return removed

    def clean_all(self):
        """Full cleanup on shutdown (executor_process.rs:542)."""
        for key in list(self.store.list(self._prefix)):
            self.store.delete(key)
