"""Scaling-efficiency harness (BASELINE.md protocol item 4).

Runs a TPC-H query through the distributed mesh runtime at increasing
device counts and reports per-count wall time, rows/s, and parallel
efficiency vs the 1-device run. On a host with one chip this measures
the virtual CPU mesh (set JAX_PLATFORMS=cpu and
XLA_FLAGS=--xla_force_host_platform_device_count=8); on a pod slice it
measures real ICI scaling with the same command.

Usage:
  python -m ballista_tpu.benchmarks.scaling --sf 0.1 --query 1 \
      --devices 1,2,4,8
Prints one JSON line: {"query": q, "sf": s, "points": [...]}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def run(sf: float, query: int, device_counts, iterations: int):
    import jax

    from ..client import SessionContext
    from ..client.context import _rebind_scans
    from ..datagen import register_tpch
    from ..parallel.mesh import make_mesh
    from ..scheduler.runtime import execute_distributed
    from .queries import TPCH_QUERIES

    ctx = SessionContext()
    register_tpch(ctx, sf)
    input_rows = sum(tp.arrow_table.num_rows for tp in ctx.tables.values()
                     if not tp.name.startswith("__"))
    points = []
    base = None
    for n in device_counts:
        if n > len(jax.devices()):
            print(f"# skipping n={n}: only {len(jax.devices())} devices",
                  file=sys.stderr)
            continue
        mesh = make_mesh(n)
        plan = _rebind_scans(ctx.sql(TPCH_QUERIES[query]).plan, ctx)
        out, schema = execute_distributed(ctx, plan, mesh)  # compile+warm
        nrows = int(out.num_rows)
        t0 = time.time()
        for _ in range(iterations):
            out, schema = execute_distributed(ctx, plan, mesh)
        _ = int(out.num_rows)  # drain
        dt = (time.time() - t0) / iterations
        rows_s = input_rows / dt
        if base is None:
            base = rows_s
        eff = rows_s / (base * n / device_counts[0])
        points.append({"devices": n, "ms": round(dt * 1000, 1),
                       "rows_per_s": round(rows_s),
                       "efficiency_vs_linear": round(eff, 3),
                       "out_rows": nrows})
        print(f"# n={n}: {dt*1000:9.1f} ms  {rows_s/1e6:8.1f}M rows/s  "
              f"eff={eff:.2f}", file=sys.stderr)
    print(json.dumps({"query": query, "sf": sf, "points": points}))
    return points


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=0.1)
    ap.add_argument("--query", type=int, default=1)
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--iterations", type=int, default=3)
    args = ap.parse_args(argv)
    # honor an explicit cpu request through the config API: the axon
    # sitecustomize captures JAX_PLATFORMS before user code runs, so the
    # env var alone silently lands on the single real chip (runner.py
    # _enable_compile_cache does the same dance)
    import os

    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    run(args.sf, args.query, [int(x) for x in args.devices.split(",")],
        args.iterations)


if __name__ == "__main__":
    main()
