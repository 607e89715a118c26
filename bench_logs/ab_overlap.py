"""A/B: async stage pipeline (exchange-compute overlap) vs per-stage
barrier (BALLISTA_STAGE_SYNC=1) on a shuffle-heavy TPC-H query over the
distributed mesh runtime. Arms are interleaved A,B,A,B to decorrelate
host noise.

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    PYTHONPATH=/root/repo python bench_logs/ab_overlap.py [sf] [query]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon sitecustomize captures JAX_PLATFORMS before user code runs
    import jax
    jax.config.update("jax_platforms", "cpu")

import ballista_tpu  # noqa: F401
from ballista_tpu.client import SessionContext
from ballista_tpu.client.context import _rebind_scans
from ballista_tpu.datagen import generate_tpch, register_tpch
from ballista_tpu.parallel.mesh import make_mesh
from ballista_tpu.benchmarks.queries import TPCH_QUERIES

SF = float(sys.argv[1]) if len(sys.argv) > 1 else 0.05
Q = int(sys.argv[2]) if len(sys.argv) > 2 else 3

ctx = SessionContext()
register_tpch(ctx, SF, data=generate_tpch(SF))
mesh = make_mesh()
plan = _rebind_scans(ctx.sql(TPCH_QUERIES[Q]).plan, ctx)

from ballista_tpu.scheduler.runtime import execute_distributed


def run_once():
    out, schema = execute_distributed(ctx, plan, mesh)
    return int(np.asarray(out.num_rows).sum())


# warm both arms' compile caches (same programs; only host orchestration
# differs, so one warm covers both)
os.environ.pop("BALLISTA_STAGE_SYNC", None)
rows = run_once()
print(f"# q{Q} sf{SF}: {rows} rows", flush=True)

K = int(os.environ.get("AB_K", "5"))
ROUNDS = int(os.environ.get("AB_ROUNDS", "4"))
res = {"async": [], "sync": []}
for r in range(ROUNDS):
    for arm in ("async", "sync"):
        if arm == "sync":
            os.environ["BALLISTA_STAGE_SYNC"] = "1"
        else:
            os.environ.pop("BALLISTA_STAGE_SYNC", None)
        t0 = time.time()
        for _ in range(K):
            run_once()
        res[arm].append((time.time() - t0) / K)
        print(f"# round {r} {arm}: {res[arm][-1]*1000:.1f} ms/run",
              flush=True)

a = min(res["async"]) * 1000
s = min(res["sync"]) * 1000
print(f"async pipeline: {a:9.1f} ms  (per-round {[round(x*1000,1) for x in res['async']]})")
print(f"stage barrier : {s:9.1f} ms  (per-round {[round(x*1000,1) for x in res['sync']]})")
print(f"overlap win: {s/a:.3f}x")
