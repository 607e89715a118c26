"""Worker for test_multihost: one process of a 2-process global mesh.

Usage: python multihost_worker.py <process_id> <num_processes> <port>
Each process owns 4 virtual CPU devices; the global mesh spans 8. All
processes run the same driver (JAX multi-controller SPMD): same data
registration, same plan, same jitted stage programs; shuffles cross the
process boundary through Gloo collectives. Prints RESULT_OK on success.
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from ballista_tpu.parallel.multihost import (init_multihost,  # noqa: E402
                                             make_global_mesh)

init_multihost(f"127.0.0.1:{port}", nproc, pid)
assert jax.process_count() == nproc
assert len(jax.devices()) == 4 * nproc

import numpy as np  # noqa: E402

from ballista_tpu import batch as B  # noqa: E402
from ballista_tpu.client import SessionContext  # noqa: E402
from ballista_tpu.datagen import generate_tpch, register_tpch  # noqa: E402
from ballista_tpu.scheduler.distributed_planner import DistOptions  # noqa: E402
from ballista_tpu.scheduler.runtime import execute_distributed  # noqa: E402

SF = 0.002
data = generate_tpch(SF)  # deterministic: identical on every process
ctx = SessionContext()
register_tpch(ctx, SF, data=data)
mesh = make_global_mesh()

sql = """
    select o_orderpriority, count(*) as n
    from orders join customer on o_custkey = c_custkey
    where o_totalprice > 1000
    group by o_orderpriority order by o_orderpriority
"""
batch, schema = execute_distributed(ctx, ctx.sql(sql).plan, mesh,
                                    DistOptions(n_partitions=4 * nproc))
got = B.to_pandas(batch, schema)

# oracle on the same in-process data
import pandas as pd  # noqa: E402

o = data["orders"].to_pandas()
c = data["customer"].to_pandas()
m = o.merge(c, left_on="o_custkey", right_on="c_custkey")
m = m[m.o_totalprice.astype(float) > 1000]
exp = (m.groupby("o_orderpriority").size().reset_index(name="n")
        .sort_values("o_orderpriority"))
assert list(got["o_orderpriority"]) == list(exp["o_orderpriority"]), \
    (list(got["o_orderpriority"]), list(exp["o_orderpriority"]))
assert list(got["n"]) == list(exp["n"]), (list(got["n"]), list(exp["n"]))
print(f"RESULT_OK p{pid} rows={len(got)}", flush=True)
