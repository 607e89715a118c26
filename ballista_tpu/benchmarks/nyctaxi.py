"""NYC taxi benchmark (reference parity: `benchmarks/src/bin/nyctaxi.rs`).

Runs the reference's query set over yellow-tripdata CSVs (pass --path) or
a synthetic tripdata table of --n rows (same schema, nyctaxi.rs:137-158).

Usage:
  python -m ballista_tpu.benchmarks.nyctaxi [--path dir_or_csv] [--n 1e6]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import numpy as np

QUERIES = {
    # nyctaxi.rs:104
    "fare_amt_by_passenger":
        "SELECT passenger_count, MIN(fare_amount), MAX(fare_amount), "
        "SUM(fare_amount) FROM tripdata GROUP BY passenger_count",
}


def synthetic_tripdata(n: int, seed: int = 42):
    import pyarrow as pa
    rng = np.random.default_rng(seed)
    return pa.table({
        "VendorID": rng.integers(1, 3, n).astype("U2"),
        "passenger_count": rng.integers(0, 7, n).astype(np.int32),
        "trip_distance": np.round(rng.exponential(3.0, n), 2).astype("U8"),
        "payment_type": rng.integers(1, 5, n).astype("U2"),
        "fare_amount": np.round(rng.gamma(2.0, 8.0, n), 2),
        "tip_amount": np.round(rng.exponential(2.0, n), 2),
        "total_amount": np.round(rng.gamma(2.0, 10.0, n), 2),
    })


def run(path: str | None, n: int, iterations: int = 3):
    from .runner import _enable_compile_cache
    from ..client import SessionContext
    _enable_compile_cache()

    ctx = SessionContext()
    t0 = time.time()
    if path:
        files = ([path] if os.path.isfile(path)
                 else sorted(glob.glob(os.path.join(path, "*.csv"))))
        import pyarrow as pa
        import pyarrow.csv as pacsv
        tables = [pacsv.read_csv(f) for f in files]
        ctx.register_arrow("tripdata", pa.concat_tables(tables))
    else:
        ctx.register_arrow("tripdata", synthetic_tripdata(n))
    print(f"# ingest {time.time() - t0:.1f}s", file=sys.stderr)

    results = {}
    for name, sql in QUERIES.items():
        t0 = time.time()
        out = ctx.sql(sql).to_pandas()
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(iterations):
            out = ctx.sql(sql).to_pandas()
        per = (time.time() - t0) / iterations
        results[name] = {"ms": round(per * 1000, 1),
                         "compile_s": round(compile_s, 1), "rows": len(out)}
        print(f"{name}  {per * 1000:10.1f} ms  ({len(out)} rows)", flush=True)
    print(json.dumps({"n": n if not path else None, "queries": results}))
    return results


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--path", default=None,
                    help="CSV file or directory of yellow-tripdata CSVs")
    ap.add_argument("--n", type=float, default=1e6,
                    help="synthetic rows when no --path")
    ap.add_argument("--iterations", type=int, default=3)
    args = ap.parse_args(argv)
    run(args.path, int(args.n), args.iterations)


if __name__ == "__main__":
    main()
