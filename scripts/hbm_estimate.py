"""Print the HBM-footprint estimate for each TPC-H query at a given SF.

Host-only (no device): builds the physical plan from dataset metadata and
runs exec.memory.estimate_plan_hbm. Used to calibrate the in-core vs
out-of-core routing threshold against the on-chip pass/fail record.

Usage:
  JAX_PLATFORMS=cpu python scripts/hbm_estimate.py --dataset-dir /root/tpch_sf10
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset-dir", default=None)
    ap.add_argument("--sf", type=float, default=None)
    ap.add_argument("--queries", default=None)
    args = ap.parse_args()

    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from ballista_tpu.benchmarks.queries import TPCH_QUERIES
    from ballista_tpu.client import SessionContext
    from ballista_tpu.client.context import _rebind_scans
    from ballista_tpu.exec.memory import (estimate_plan_hbm, hbm_budget_bytes,
                                          plan_serial_partitions)
    from ballista_tpu.planner.optimizer import prune_columns, reduce_group_keys
    from ballista_tpu.planner.physical import create_physical_plan

    ctx = SessionContext()
    if args.dataset_dir:
        from ballista_tpu.datagen.tpch import TPCH_TABLES
        for name in TPCH_TABLES:
            d = os.path.join(args.dataset_dir, name)
            if os.path.isdir(d):
                ctx.register_parquet_dataset(name, d, TPCH_TABLES[name][1])
    else:
        from ballista_tpu.datagen import generate_tpch, register_tpch
        register_tpch(ctx, args.sf or 1.0)

    budget = hbm_budget_bytes()
    print(f"# budget {budget / 1e9:.1f} GB")
    queries = ([int(x) for x in args.queries.split(",")] if args.queries
               else sorted(TPCH_QUERIES))
    capacities = {n: tp.capacity for n, tp in ctx.tables.items()}
    for q in queries:
        t0 = time.time()
        try:
            plan = _rebind_scans(
                prune_columns(reduce_group_keys(
                    ctx.sql(TPCH_QUERIES[q]).plan)), ctx)
            ep = create_physical_plan(plan, capacities, ctx.options)
            est = estimate_plan_hbm(ep)
            route = ("in-core" if est <= budget else
                     f"serial@{plan_serial_partitions(est, budget)}")
            print(f"q{q:2d}  {est / 1e9:8.2f} GB  {route:12s} "
                  f"({time.time() - t0:.1f}s plan)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"q{q:2d}  ERROR {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
