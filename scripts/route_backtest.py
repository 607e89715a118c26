"""Back-test the in-core vs out-of-core router against the on-chip
record (VERDICT r4 #8): for every query with a recorded SF10 outcome,
compare what route_serial WOULD decide today (estimate + OOM memo)
against what actually happened on the 16 GB chip.

The on-chip record (bench_logs/sf10_r3.log, sf10_r4*.log, sf10_r5.log):
  fits  — ran in-core successfully
  ooms  — in-core attempt died with RESOURCE_EXHAUSTED / compile OOM
  (queries only ever run serial have no in-core ground truth)

A correct decision is: route in-core for every `fits` query, serial for
every `ooms` query. The estimator's ±30% band cannot order q5/q8 (OOM at
est 14.4/15.1 GB) below q7/q9/q18 (fit at est 15.1/21.1/15.7 GB) — the
OOM memo (exec/memory.py oom_memo_lookup) is the load-bearing mechanism
for the overlap zone, so the back-test runs WITH the memo primed the way
a production deployment's would be after one encounter.

Usage:
  JAX_PLATFORMS=cpu python scripts/route_backtest.py \
      --dataset-dir /root/tpch_sf10
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# On-chip ground truth at SF10 on the 16 GB v5e (see bench_logs/).
# Round 5's padded-gather fix (ops/gather.py) made EVERY query fit
# in-core (bench_logs/sf10_r5_incore.log); the OOMS list is empty and
# stays as the hook for future regressions.
FITS = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18,
        19, 20, 21, 22]
OOMS = []


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset-dir", default="/root/tpch_sf10")
    ap.add_argument("--budget", type=float, default=14.1 * 2 ** 30,
                    help="HBM budget bytes (v5e default)")
    args = ap.parse_args()

    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from ballista_tpu.benchmarks.queries import TPCH_QUERIES
    from ballista_tpu.client import SessionContext
    from ballista_tpu.client.context import _rebind_scans
    from ballista_tpu.datagen.tpch import TPCH_TABLES
    from ballista_tpu.exec.memory import (oom_memo_lookup, oom_memo_record,
                                          plan_fingerprint, route_serial)
    from ballista_tpu.planner.optimizer import (prune_columns,
                                                reduce_group_keys)
    from ballista_tpu.planner.physical import create_physical_plan

    ctx = SessionContext()
    for t in TPCH_TABLES:
        ctx.register_parquet(t, os.path.join(args.dataset_dir, t))
    caps = {n: tp.capacity for n, tp in ctx.tables.items()}

    def plan_of(q):
        lp = prune_columns(reduce_group_keys(
            _rebind_scans(ctx.sql(TPCH_QUERIES[q]).plan, ctx)))
        return create_physical_plan(lp, caps, ctx.options)

    # prime the memo exactly as one production encounter would
    for q in OOMS:
        ep = plan_of(q)
        fp = plan_fingerprint(ep)
        if not oom_memo_lookup(fp):
            oom_memo_record(fp, 4)
    del oom_memo_lookup, oom_memo_record, plan_fingerprint

    results, wrong = {}, []
    for q in sorted(FITS + OOMS):
        ep = plan_of(q)
        n = route_serial(ep, budget=int(args.budget))
        decided = "serial" if n else "in-core"
        want = "serial" if q in OOMS else "in-core"
        ok = decided == want
        if not ok:
            wrong.append(q)
        results[q] = {"decision": decided, "serial_n": n,
                      "ground_truth": want, "correct": ok}
        print(f"q{q:2d}  decided={decided:8s} truth={want:8s} "
              f"{'OK' if ok else 'WRONG'}")
    print(json.dumps({"correct": len(results) - len(wrong),
                      "total": len(results), "wrong": wrong}))
    return 1 if wrong else 0


if __name__ == "__main__":
    sys.exit(main())
