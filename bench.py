"""Headline benchmark: TPC-H Q1 at SF1 on one chip.

Prints ONE JSON line:
  {"metric": "tpch_q1_sf1_rows_per_s", "value": N, "unit": "rows/s",
   "vs_baseline": R}

vs_baseline compares against a single-threaded pandas implementation of the
same query on this host (the reference's own numbers are unpublished and
its Rust toolchain is unavailable here — see BASELINE.md; pandas stands in
as the CPU columnar baseline).
"""

import json
import os
import sys
import time

import numpy as np

# persistent compile cache: first-ever run pays ~80s of remote TPU
# compilation; subsequent runs on this host hit the cache
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

SF = float(os.environ.get("BENCH_SF", "1.0"))
QUERY = 1


def _enable_cache():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def bench_engine(data):
    import ballista_tpu  # noqa: x64
    import jax
    _enable_cache()
    from ballista_tpu import batch as B
    from ballista_tpu.benchmarks import TPCH_QUERIES
    from ballista_tpu.client import SessionContext
    from ballista_tpu.client.context import _rebind_scans
    from ballista_tpu.datagen import register_tpch

    ctx = SessionContext(capacity_mode="bucket")
    register_tpch(ctx, SF, data=data)

    t0 = time.time()
    from ballista_tpu.planner.optimizer import prune_columns
    plan = _rebind_scans(prune_columns(ctx.sql(TPCH_QUERIES[QUERY]).plan), ctx)
    ingest_s = time.time() - t0

    # warmup/compile (also warms the host<->device transfer path);
    # overflow-converged so capacity clips can never fake a result
    t0 = time.time()
    fn, inputs, exec_plan, out = ctx.converge_compile(plan, pruned=True)
    _ = int(out.num_rows)
    compile_s = time.time() - t0

    # NOTE: block_until_ready through the axon relay does not reliably
    # fence device execution, so time K dispatches drained by a forced
    # device->host scalar fetch; per-iter = total / K.
    K = 10
    t0 = time.time()
    for _ in range(K):
        out, _overflow = fn(inputs)
    n = int(out.num_rows)
    best = (time.time() - t0) / K
    df = B.to_pandas(out, exec_plan.schema)
    return best, df, {"ingest_s": round(ingest_s, 2),
                      "compile_s": round(compile_s, 2),
                      "per_iter_ms": round(best * 1000, 3)}


def bench_pandas(data):
    sys.path.insert(0, "tests")
    from tpch_oracle import ORACLES, to_pd

    pdt = to_pd({"lineitem": data["lineitem"]})
    # warm caches
    ORACLES[QUERY](pdt)
    times = []
    for _ in range(3):
        t0 = time.time()
        exp = ORACLES[QUERY](pdt)
        times.append(time.time() - t0)
    return min(times), exp


def main():
    from ballista_tpu.datagen import generate_tpch

    data = generate_tpch(SF, tables=["lineitem"])
    n_rows = data["lineitem"].num_rows

    # the remote compile service can drop mid-request (observed once:
    # connection refused, recovered later), and a long benchmark sweep in
    # another process may be holding HBM (it evicts between queries, so a
    # window opens every few minutes); retry with patience so neither
    # voids the benchmark
    attempts = 8
    for attempt in range(attempts):
        try:
            engine_s, got, info = bench_engine(data)
            break
        except Exception as e:  # noqa: BLE001
            if attempt == attempts - 1:
                raise
            wait = 150 if "RESOURCE_EXHAUSTED" in str(e) else 120
            print(f"# engine attempt {attempt + 1} failed "
                  f"({type(e).__name__}); retrying in {wait}s",
                  file=sys.stderr)
            time.sleep(wait)
    pandas_s, exp = bench_pandas(data)

    # sanity: results must agree with the oracle
    ok = len(got) == len(exp)
    if ok:
        for col in ("sum_qty", "sum_base_price", "count_order"):
            if not np.allclose(got[col].astype(float), exp[col].astype(float),
                               rtol=1e-9):
                ok = False

    rows_per_s = n_rows / engine_s
    result = {
        "metric": f"tpch_q{QUERY}_sf{SF:g}_rows_per_s",
        "value": round(rows_per_s),
        "unit": "rows/s",
        "vs_baseline": round(pandas_s / engine_s, 3),
    }
    print(json.dumps(result))
    print(f"# engine={engine_s * 1000:.1f}ms pandas={pandas_s * 1000:.1f}ms "
          f"rows={n_rows} correct={ok} {info}", file=sys.stderr)
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
