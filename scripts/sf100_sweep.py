"""SF100 TPC-H sweep: out-of-core execution with invariant verification.

At SF100 (600M lineitem rows) the pandas oracle is infeasible, so each
query's result is checked against INVARIANTS instead (the reference's
--expected-results needs published answers we cannot fetch offline):

- exact output row counts where the query fixes them (top-k LIMITs,
  fixed group domains: q1's 4 flag/status pairs, q9's 175 nation-years);
- scale-ratio vs the ORACLE-VERIFIED SF10 result: additive aggregates
  (sums/counts) must land at ~10x their SF10 value, averages/ratios at
  ~1x (the deterministic datagen draws iid per row, so ratios
  concentrate tightly).

Each query runs in its own subprocess (HBM isolation) with the runner's
automatic out-of-core routing deciding in-core vs serial; results are
saved as parquet for later inspection.

Usage:
  python scripts/sf100_sweep.py --dataset-dir /root/tpch_sf100 \
      --sf10-results bench_logs/sf10_r4.json --out bench_logs/sf100_r4
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# queries whose output row count is fixed by the spec (top-k LIMIT or a
# closed group domain) at any scale factor >= 1
FIXED_ROWS = {1: 4, 2: 100, 3: 10, 4: 5, 5: 5, 6: 1, 7: 4, 8: 2, 9: 175,
              10: 20, 12: 2, 14: 1, 15: 1, 17: 1, 18: 100, 19: 1, 21: 100,
              22: 7}
# queries whose FIRST numeric metric is additive in the row count
# (sum/count): SF100/SF10 ratio must be ~10
ADDITIVE = {1, 4, 6, 7, 12, 13, 22}
# queries whose first numeric is a RATIO/percentage of iid per-row draws
# (concentrates to the same value at any SF): SF100/SF10 must be ~1x
RATIO_1X = {14, 17}
# group domains that saturate at SF>=10: SF100 row count must equal the
# oracle-verified SF10 row count (q16: every live brand/type/size combo)
SATURATED_ROWS = {16}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset-dir", default="/root/tpch_sf100")
    ap.add_argument("--sf", type=float, default=100)
    ap.add_argument("--queries", default=None)
    ap.add_argument("--timeout", type=int, default=10800)
    ap.add_argument("--sf10-oracle", default="/root/oracle_sf10",
                    help="SF10 oracle cache dir (oracle_sf10_q{n}.parquet, "
                         "verified against the engine by the SF10 sweep) "
                         "for scale-ratio checks")
    ap.add_argument("--out", default="bench_logs/sf100")
    args = ap.parse_args()

    queries = ([int(x) for x in args.queries.split(",")] if args.queries
               else list(range(1, 23)))
    results = {}
    t_start = time.time()
    os.makedirs(args.out + "_results", exist_ok=True)
    for q in queries:
        cmd = [sys.executable, "-m", "ballista_tpu.benchmarks.runner",
               "--sf", str(args.sf), "--queries", str(q),
               "--iterations", "1", "--lazy-ingest",
               "--dataset-dir", args.dataset_dir,
               "--save-results", f"{args.out}_results"]
        env = dict(os.environ)
        env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
        t0 = time.time()
        try:
            p = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=args.timeout, cwd=REPO, env=env)
            lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
            res = (json.loads(lines[-1])["queries"][str(q)] if lines
                   else {"error": f"rc={p.returncode}",
                         "tail": (p.stdout + p.stderr)[-1500:]})
        except subprocess.TimeoutExpired:
            res = {"error": f"timeout>{args.timeout}s"}
        res["wall_s"] = round(time.time() - t0, 1)
        res.update(_verify(q, args, res))
        results[q] = res
        print(f"q{q:2d}  {json.dumps(res)[:200]}", flush=True)
        with open(args.out + ".json", "w") as f:
            json.dump({"sf": args.sf, "elapsed_s": round(
                time.time() - t_start, 1), "queries": results}, f, indent=1)
    ok = sum(1 for r in results.values()
             if "ms" in r and r.get("verified") is not False)
    print(json.dumps({"sf": args.sf, "ok": ok, "total": len(queries)}),
          flush=True)


def _verify(q, args, res):
    """Invariant checks over the saved result parquet."""
    out = {}
    path = f"{args.out}_results/q{q}.parquet"
    if "ms" not in res or not os.path.exists(path):
        return out
    import pandas as pd
    df = pd.read_parquet(path)
    checks = []
    if q in FIXED_ROWS:
        checks.append(("rows", len(df) == FIXED_ROWS[q],
                       f"{len(df)} vs {FIXED_ROWS[q]}"))
    sf10_path = os.path.join(args.sf10_oracle or "",
                             f"oracle_sf10_q{q}.parquet")
    if os.path.exists(sf10_path) and (q in ADDITIVE or q in RATIO_1X):
        ref = pd.read_parquet(sf10_path)
        num = [c for c in df.columns
               if df[c].dtype.kind in "if" and c in ref.columns]
        if num and len(ref):
            ratio = float(df[num[0]].sum()) / max(
                float(ref[num[0]].sum()), 1e-9)
            if q in ADDITIVE:
                checks.append(("scale10x", 8.0 <= ratio <= 12.0,
                               f"ratio={ratio:.2f}"))
            else:
                checks.append(("ratio1x", 0.9 <= ratio <= 1.1,
                               f"ratio={ratio:.3f}"))
    if q in SATURATED_ROWS and os.path.exists(sf10_path):
        ref = pd.read_parquet(sf10_path)
        checks.append(("saturated_rows", len(df) == len(ref),
                       f"{len(df)} vs sf10 {len(ref)}"))
    out["checks"] = {name: detail for name, ok, detail in checks}
    out["verified"] = all(ok for _, ok, _ in checks) if checks else None
    return out


def reverify(out_prefix, sf10_oracle="/root/oracle_sf10"):
    """Re-run invariant checks over an existing sweep's saved parquets
    (used post-hoc after verifier improvements)."""
    import types
    with open(out_prefix + ".json") as f:
        doc = json.load(f)
    args = types.SimpleNamespace(out=out_prefix, sf10_oracle=sf10_oracle)
    for q, res in doc["queries"].items():
        res.update(_verify(int(q), args, res))
    doc["ok"] = sum(1 for r in doc["queries"].values()
                    if "ms" in r and r.get("verified"))
    with open(out_prefix + ".json", "w") as f:
        json.dump(doc, f, indent=1)
    return doc


if __name__ == "__main__":
    main()
