"""TPC-H benchmark runner (the reference's `tpch.rs benchmark` analog).

Times every query with the dispatch-drain method (K dispatches then a
forced device->host scalar fetch; block_until_ready is not a reliable
fence through the axon relay). Prints a per-query table + JSON summary.

Usage:
  python -m ballista_tpu.benchmarks.runner --sf 1 [--queries 1,3,6] \
      [--iterations 5] [--distributed]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def run(sf: float, queries, iterations: int, distributed: bool):
    import jax
    from .. import batch as B
    from ..client import SessionContext
    from ..client.context import _rebind_scans
    from ..datagen import register_tpch
    from ..exec.plan import compile_stage
    from ..planner.physical import create_physical_plan
    from .queries import TPCH_QUERIES

    ctx = SessionContext()
    t0 = time.time()
    register_tpch(ctx, sf)
    print(f"# datagen {time.time() - t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    for tp in ctx.tables.values():
        tp._ensure()
    print(f"# ingest {time.time() - t0:.1f}s", file=sys.stderr)

    mesh = None
    if distributed:
        from ..parallel.mesh import make_mesh
        mesh = make_mesh()

    results = {}
    for q in queries:
        try:
            t0 = time.time()
            plan = _rebind_scans(ctx.sql(TPCH_QUERIES[q]).plan, ctx)
            if distributed:
                from ..scheduler.runtime import execute_distributed
                # distributed path: plan+compile+run per call (stage cache
                # inside the runtime); time end-to-end
                out, schema = execute_distributed(ctx, plan, mesh)
                compile_s = time.time() - t0
                t0 = time.time()
                for _ in range(iterations):
                    out, schema = execute_distributed(ctx, plan, mesh)
                per_iter = (time.time() - t0) / iterations
                nrows = int(out.num_rows)
            else:
                capacities = {n: tp.capacity for n, tp in ctx.tables.items()}
                ep = create_physical_plan(plan, capacities, ctx.options)
                fn, ids = compile_stage(ep)
                inputs = {i: ctx.tables[i].batch for i in set(ids)}
                out = fn(inputs)
                nrows = int(out.num_rows)  # drain (compile+warmup)
                compile_s = time.time() - t0
                t0 = time.time()
                for _ in range(iterations):
                    out = fn(inputs)
                nrows = int(out.num_rows)
                per_iter = (time.time() - t0) / iterations
            results[q] = {"ms": round(per_iter * 1000, 1),
                          "compile_s": round(compile_s, 1), "rows": nrows}
            print(f"q{q:2d}  {per_iter * 1000:10.1f} ms   "
                  f"(compile {compile_s:6.1f}s, {nrows} rows)", flush=True)
        except Exception as e:  # noqa: BLE001 - keep benching other queries
            results[q] = {"error": f"{type(e).__name__}: {e}"}
            print(f"q{q:2d}  ERROR {type(e).__name__}: {e}", flush=True)
    total = sum(r["ms"] for r in results.values() if "ms" in r)
    print(json.dumps({"sf": sf, "total_ms": round(total, 1),
                      "queries": results}))
    return results


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--queries", default=None,
                    help="comma-separated query numbers (default: all)")
    ap.add_argument("--iterations", type=int, default=3)
    ap.add_argument("--distributed", action="store_true")
    args = ap.parse_args(argv)
    queries = ([int(x) for x in args.queries.split(",")] if args.queries
               else list(range(1, 23)))
    run(args.sf, queries, args.iterations, args.distributed)


if __name__ == "__main__":
    main()
