"""Precompute pandas-oracle TPC-H answers into the oracle cache.

Reads the SAME chunked parquet dataset the engine mounts (--dataset-dir),
so cached answers are exact for any sweep over that dataset. Run once on
CPU (no JAX) before a verified on-chip sweep; `runner --verify` then hits
the cache instead of re-paying 1-8 min of pandas per query per process.

Usage:
  BALLISTA_ORACLE_CACHE=/root/oracle_sf10 python scripts/oracle_pregen.py \
      --dataset-dir /root/tpch_sf10 --sf 10 [--queries 1,3,6]
"""

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset-dir", required=True)
    ap.add_argument("--sf", type=float, required=True,
                    help="scale factor used in the cache key (must match "
                         "the runner's --sf)")
    ap.add_argument("--queries", default=None)
    args = ap.parse_args()
    cache = os.environ.get("BALLISTA_ORACLE_CACHE")
    assert cache, "set BALLISTA_ORACLE_CACHE to the cache directory"

    import pyarrow.parquet as pq
    import pyarrow as pa
    from ballista_tpu.benchmarks.oracle import ORACLES, to_pd
    from ballista_tpu.benchmarks.runner import _oracle_cached
    from ballista_tpu.datagen.tpch import TPCH_TABLES

    queries = ([int(x) for x in args.queries.split(",")] if args.queries
               else sorted(ORACLES))
    missing = [q for q in queries if not os.path.exists(os.path.join(
        cache, f"oracle_sf{args.sf:g}_q{q}.parquet"))]
    if not missing:
        print("all cached", flush=True)
        return

    t0 = time.time()
    tables = {}
    for name in TPCH_TABLES:
        files = sorted(glob.glob(os.path.join(args.dataset_dir, name,
                                              "*.parquet")))
        tables[name] = pa.concat_tables(pq.read_table(f) for f in files)
        print(f"# read {name}: {tables[name].num_rows} rows "
              f"({time.time() - t0:.0f}s)", flush=True)
    pdt = to_pd(tables)
    del tables
    print(f"# pandas tables ready {time.time() - t0:.0f}s", flush=True)

    for q in missing:
        t1 = time.time()
        _oracle_cached(q, args.sf, pdt)
        print(f"q{q:2d} oracle cached in {time.time() - t1:.1f}s", flush=True)
    print(f"done {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
