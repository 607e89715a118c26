"""Standalone-cluster example (reference: examples/src/bin/standalone-sql.rs).

Runs SQL through the full control plane — scheduler, ExecutionGraph,
mesh task launcher — in one process over the device mesh (use
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 to
try without a TPU).
Run:  PYTHONPATH=. python examples/standalone_sql.py
"""

from ballista_tpu.client import SessionContext
from ballista_tpu.datagen import register_tpch
from ballista_tpu.parallel.mesh import make_mesh
from ballista_tpu.scheduler.distributed_planner import DistOptions
from ballista_tpu.scheduler.standalone import StandaloneCluster


def main():
    ctx = SessionContext()
    register_tpch(ctx, 0.01)

    mesh = make_mesh()
    n = mesh.devices.size
    cluster = StandaloneCluster(ctx, mesh, DistOptions(n_partitions=n))

    print(cluster.sql(
        "select l_returnflag, l_linestatus, sum(l_quantity) as sum_qty, "
        "count(*) as count_order from lineitem "
        "where l_shipdate <= date '1998-09-02' "
        "group by l_returnflag, l_linestatus "
        "order by l_returnflag, l_linestatus"))
    print(cluster.job_status(list(cluster.launcher.jobs)[-1]))


if __name__ == "__main__":
    main()
