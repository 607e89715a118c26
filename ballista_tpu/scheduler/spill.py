"""Stage-output spill: shuffle data that survives executor loss.

Reference parity: the Replicator (`executor/src/replicator/mod.rs:76`)
uploads every shuffle file to object storage so ShuffleReaderExec can fall
back to it when the producing executor dies (`shuffle_reader.rs:395-537`).
Here stage outputs are device arrays, so the spill is a host fetch +
Arrow IPC file per stage under `work_dir/<job_id>/stage_<id>.arrow`
(the reference's shuffle-file layout, `shuffle_writer.rs` path scheme);
restore re-feeds the mesh without re-running the producer chain.

Point `work_dir` at NFS/FUSE-mounted object storage for the GCS-upload
behavior; the IO layer is identical.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

import pyarrow as pa

from ..parallel.partitioned import PartitionedBatch
from ..parallel.multihost import host_local_array
from ..batch import Column


class StageSpiller:
    def __init__(self, work_dir: str):
        self.work_dir = work_dir
        os.makedirs(work_dir, exist_ok=True)

    def _path(self, job_id: str, stage_id: int) -> str:
        d = os.path.join(self.work_dir, job_id)
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, f"stage_{stage_id}.arrow")

    def spill(self, job_id: str, stage_id: int, pb: PartitionedBatch):
        """Persist a stage's sharded output: per-column (P, cap) data +
        validity planes plus per-shard row counts, one IPC file."""
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
        tmp = self._path(job_id, stage_id) + ".tmp"
        with pa.OSFile(tmp, "wb") as f:
            with pa.ipc.new_file(f, table.schema) as w:
                w.write_table(table)
        os.replace(tmp, self._path(job_id, stage_id))

    def restore(self, job_id: str, stage_id: int,
                mesh=None) -> Optional[PartitionedBatch]:
        """Reload a spilled stage output onto the mesh (the object-store
        fallback read, shuffle_reader.rs:787-858)."""
        path = self._path(job_id, stage_id)
        if not os.path.exists(path):
            return None
        with pa.OSFile(path, "rb") as f:
            table = pa.ipc.open_file(f).read_all()
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

    def clean_job(self, job_id: str):
        """RemoveJobData parity (executor_server.rs:1210): delete a job's
        spilled files."""
        import shutil
        d = os.path.join(self.work_dir, job_id)
        if os.path.isdir(d):
            shutil.rmtree(d)

    def clean_expired(self, ttl_seconds: float = 7 * 24 * 3600) -> list:
        """Shuffle-data TTL cleaner parity (clean_shuffle_data_loop,
        executor_process.rs:503; default TTL 7 days): remove job spill
        directories whose newest file is older than the TTL. Returns the
        removed job ids."""
        import shutil
        import time
        removed = []
        now = time.time()
        for job_id in list(os.listdir(self.work_dir)):
            d = os.path.join(self.work_dir, job_id)
            if not os.path.isdir(d):
                continue
            try:
                newest = max((os.path.getmtime(os.path.join(d, f))
                              for f in os.listdir(d)), default=0)
            except OSError:
                continue
            if now - newest > ttl_seconds:
                shutil.rmtree(d, ignore_errors=True)
                removed.append(job_id)
        return removed

    def clean_all(self):
        """Full cleanup on shutdown (executor_process.rs:542)."""
        import shutil
        for job_id in list(os.listdir(self.work_dir)):
            d = os.path.join(self.work_dir, job_id)
            if os.path.isdir(d):
                shutil.rmtree(d, ignore_errors=True)
