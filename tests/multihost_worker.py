"""Worker for test_multihost: one process of a 2-process global mesh.

Usage: python multihost_worker.py <process_id> <num_processes> <port> [scenario]
Each process owns 4 virtual CPU devices; the global mesh spans 8. All
processes run the same driver (JAX multi-controller SPMD): same data
registration, same plan, same jitted stage programs; shuffles cross the
process boundary through Gloo collectives. Prints RESULT_OK on success.

Scenarios:
  basic  - orders x customer group-by (the smoke query)
  skew   - hot-key join that overflows its quota and escalates to a
           SALTED shuffle crossing the process boundary (stats-driven
           retry must take identical decisions on every process)
  crash  - the worker named by BALLISTA_CRASH_WORKER exits hard before
           dispatching; the survivor's watchdog detects the lost peer
           (the reference's heartbeat-expiry failure detection,
           executor_manager.rs:450) and exits 3 with PEER_LOST so the
           controller can restart the job (single-controller recovery:
           job_store.recover_jobs + re-run).
"""

import os
import sys
import threading

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
scenario = sys.argv[4] if len(sys.argv) > 4 else "basic"
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
import pandas as pd  # noqa: E402
import pyarrow as pa  # noqa: E402

from ballista_tpu import batch as B  # noqa: E402
from ballista_tpu.client import SessionContext  # noqa: E402
from ballista_tpu.datagen import generate_tpch, register_tpch  # noqa: E402
from ballista_tpu.scheduler.distributed_planner import DistOptions  # noqa: E402
from ballista_tpu.scheduler.runtime import execute_distributed  # noqa: E402

mesh = make_global_mesh()

if os.environ.get("BALLISTA_CRASH_WORKER") == str(pid):
    # die without a word mid-job: the peer must DETECT this, not hang
    os._exit(17)

# failure detection: a peer that died leaves our collective blocked
# forever; the watchdog is this runtime's heartbeat-expiry analog
# (executor_manager.rs:450 — 180s there, scaled down for the test)
deadline = float(os.environ.get("BALLISTA_PEER_TIMEOUT", "120"))


def _watchdog():
    print(f"PEER_LOST p{pid} (no progress within {deadline}s)", flush=True)
    os._exit(3)


timer = threading.Timer(deadline, _watchdog)
timer.daemon = True
timer.start()

if scenario == "skew":
    rng = np.random.default_rng(0)  # deterministic: identical per process
    n = 4000
    keys = np.where(rng.random(n) < 0.85, 7, rng.integers(0, 100, n))
    fact = pa.table({"k": pa.array(keys, pa.int64()),
                     "v": pa.array(rng.integers(0, 1000, n), pa.int64())})
    dim = pa.table({"dk": pa.array(np.arange(100), pa.int64()),
                    "w": pa.array(np.arange(100) * 10, pa.int64())})
    ctx = SessionContext()
    ctx.register_arrow("fact", fact, primary_key=None)
    ctx.register_arrow("dim", dim, primary_key=("dk",))
    sql = ("select k, sum(v + w) as s, count(*) c from fact join dim "
           "on k = dk group by k order by k")
    # tight quota forces overflow -> stats-driven salt retry ACROSS hosts
    opts = DistOptions(n_partitions=4 * nproc, broadcast_threshold=0,
                       min_quota=16, quota_headroom=1.05)
    batch, schema = execute_distributed(ctx, ctx.sql(sql).plan, mesh, opts)
    got = B.to_pandas(batch, schema)
    f, d = fact.to_pandas(), dim.to_pandas()
    m = f.merge(d, left_on="k", right_on="dk")
    exp = (m.assign(s=m.v + m.w).groupby("k")
            .agg(s=("s", "sum"), c=("s", "size")).reset_index()
            .sort_values("k"))
    assert list(got["k"]) == list(exp["k"])
    assert list(got["s"]) == list(exp["s"])
    assert list(got["c"]) == list(exp["c"])
    timer.cancel()
    print(f"RESULT_OK p{pid} rows={len(got)}", flush=True)
    sys.exit(0)

SF = 0.002
data = generate_tpch(SF)  # deterministic: identical on every process
ctx = SessionContext()
register_tpch(ctx, SF, data=data)

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
o = data["orders"].to_pandas()
c = data["customer"].to_pandas()
m = o.merge(c, left_on="o_custkey", right_on="c_custkey")
m = m[m.o_totalprice.astype(float) > 1000]
exp = (m.groupby("o_orderpriority").size().reset_index(name="n")
        .sort_values("o_orderpriority"))
assert list(got["o_orderpriority"]) == list(exp["o_orderpriority"]), \
    (list(got["o_orderpriority"]), list(exp["o_orderpriority"]))
assert list(got["n"]) == list(exp["n"]), (list(got["n"]), list(exp["n"]))
timer.cancel()
print(f"RESULT_OK p{pid} rows={len(got)}", flush=True)
