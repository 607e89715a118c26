"""Multi-host execution: one global mesh across processes.

Reference parity: Ballista's multi-executor fleet (scheduler + N executor
processes over gRPC/Flight, `executor_process.rs:98`) re-imagined for the
JAX multi-controller SPMD model (SURVEY.md §7 step 7): every host runs the
same driver program; `jax.distributed` (the control plane the reference
builds from tonic gRPC) connects them; the global mesh spans all hosts'
devices; shuffles ride the same in-program collectives as single-host —
over ICI within a slice, DCN/Gloo across hosts — instead of
Flight-over-TCP shuffle files.

Host responsibilities map:
  scheduler/executor registration  -> jax.distributed.initialize barrier
  task launch RPC                  -> SPMD program replication (no RPC)
  shuffle write/fetch              -> in-program all_to_all (cross-host)
  result Flight fetch              -> process_allgather egress
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

from .mesh import PARTITION_AXIS


def init_multihost(coordinator_address: str, num_processes: int,
                   process_id: int, local_device_count: int | None = None):
    """Join the cluster (all processes must call this with the same
    coordinator). Call before any backend use; returns (process_id,
    global device count)."""
    kwargs = {}
    if local_device_count is not None:
        kwargs["local_device_ids"] = list(range(local_device_count))
    jax.distributed.initialize(coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_index(), len(jax.devices())


def make_global_mesh(n_devices: int | None = None) -> Mesh:
    """Partition mesh over ALL hosts' devices (jax.devices() is global)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]), (PARTITION_AXIS,))


def is_multihost() -> bool:
    return jax.process_count() > 1


def host_local_array(arr) -> np.ndarray:
    """Materialize a (possibly cross-host sharded) array on every host.

    Single-host arrays convert directly; multi-host arrays go through a
    process allgather (the result-egress analog of the client
    Flight-fetching final partitions from every executor)."""
    if getattr(arr, "is_fully_addressable", True):
        return np.asarray(arr)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(arr, tiled=True))
