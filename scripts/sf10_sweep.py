"""Unattended all-22 TPC-H sweep with per-query process isolation.

The round-3 lesson (`bench_logs/sf10_r3b.log`): one query's OOM poisons
the rest of an in-process sweep — eviction/clear_caches does not reliably
release HBM held by a long-lived PJRT client. Each query therefore runs
in a FRESH subprocess (its HBM dies with it) sharing the persistent
compile cache (JAX_COMPILATION_CACHE_DIR) and the pandas-oracle cache
(BALLISTA_ORACLE_CACHE). The runner auto-routes HBM-oversized plans to
the out-of-core serial runtime (exec/memory.py) and falls back to it on
RESOURCE_EXHAUSTED in-process; if a subprocess still dies, the driver
retries it once with a forced --serial N.

Reference bar: `benchmarks/src/bin/tpch.rs:353` + README.md:55-61 — all
22 queries at SF10 on one node.

Usage:
  python scripts/sf10_sweep.py --sf 10 --dataset-dir /root/tpch_sf10 \
      --oracle-cache /root/oracle_sf10 --out bench_logs/sf10_r4
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_query(q, args, serial=0, timeout=5400):
    cmd = [sys.executable, "-m", "ballista_tpu.benchmarks.runner",
           "--sf", str(args.sf), "--queries", str(q),
           "--iterations", str(args.iterations), "--lazy-ingest"]
    if args.dataset_dir:
        cmd += ["--dataset-dir", args.dataset_dir]
    if args.verify:
        cmd.append("--verify")
    if serial:
        cmd += ["--serial", str(serial)]
    env = dict(os.environ)
    if args.oracle_cache:
        env["BALLISTA_ORACLE_CACHE"] = args.oracle_cache
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    t0 = time.time()
    try:
        p = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout, cwd=REPO, env=env)
    except subprocess.TimeoutExpired as e:
        def _s(x):
            # TimeoutExpired captures raw BYTES even under text=True
            return (x.decode(errors="replace") if isinstance(x, bytes)
                    else x) or ""
        return ({"error": f"timeout>{timeout}s"}, _s(e.stdout),
                _s(e.stderr), time.time() - t0)
    lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
    if lines:
        try:
            res = json.loads(lines[-1])["queries"][str(q)]
            return res, p.stdout, p.stderr, time.time() - t0
        except Exception:  # noqa: BLE001
            pass
    return ({"error": f"rc={p.returncode}",
             "tail": (p.stdout + p.stderr)[-2000:]},
            p.stdout, p.stderr, time.time() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=10)
    ap.add_argument("--dataset-dir", default=None)
    ap.add_argument("--oracle-cache", default=None)
    ap.add_argument("--queries", default=None)
    ap.add_argument("--iterations", type=int, default=3)
    ap.add_argument("--verify", action="store_true", default=True)
    ap.add_argument("--no-verify", dest="verify", action="store_false")
    ap.add_argument("--timeout", type=int, default=5400)
    ap.add_argument("--retry-serial", type=int, default=8,
                    help="forced --serial N for the one driver-level retry "
                         "after a subprocess-level failure")
    ap.add_argument("--out", default="bench_logs/sweep")
    args = ap.parse_args()

    queries = ([int(x) for x in args.queries.split(",")] if args.queries
               else list(range(1, 23)))
    results = {}
    t_start = time.time()
    for q in queries:
        res, out, err, dt = run_query(q, args, timeout=args.timeout)
        attempt = "auto"
        if "error" in res:
            # subprocess died (OOM the in-process fallback couldn't catch,
            # crash, timeout): one retry in a fresh process, forced serial
            print(f"q{q:2d}  first attempt failed ({res['error']}); "
                  f"retrying --serial {args.retry_serial}", flush=True)
            with open(f"{args.out}_q{q}_fail.log", "w") as f:
                f.write(out + "\n=== stderr ===\n" + err)
            # serial retries stream the dataset from parquet per pass:
            # give them twice the budget
            res, out, err, dt2 = run_query(q, args, serial=args.retry_serial,
                                           timeout=args.timeout * 2)
            attempt = f"retry-serial@{args.retry_serial}"
            dt += dt2
        res["wall_s"] = round(dt, 1)
        res["attempt"] = attempt
        results[q] = res
        line = [l for l in out.splitlines() if l.startswith(f"q{q:2d}")]
        routed = [l for l in err.splitlines()
                  if "auto-routed" in l or "falling back" in l]
        for r in routed:
            print(r, flush=True)
        print(line[-1] if line else f"q{q:2d}  {json.dumps(res)}",
              flush=True)
        with open(args.out + ".json", "w") as f:
            json.dump({"sf": args.sf, "elapsed_s": round(
                time.time() - t_start, 1), "queries": results}, f, indent=1)
    ok = sum(1 for r in results.values()
             if "ms" in r and r.get("match") is not False)
    print(json.dumps({"sf": args.sf, "ok": ok, "total": len(queries),
                      "wall_s": round(time.time() - t_start, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
