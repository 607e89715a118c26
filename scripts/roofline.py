"""Roofline accounting on the chip (BASELINE.md target: each operator
>= 70% of per-chip HBM roofline).

Runs queries with BALLISTA_PIECE_TIMING=1 (the built-in per-piece
profiler: dispatch-drain timing + bytes-touched floor + %-of-roofline,
exec/plan.py _timed_piece) and reduces the stderr stream into a
per-operator table sorted by total time, so the worst-roofline operator
is the next optimization target.

Usage (on the chip):
  python scripts/roofline.py --sf 1 --queries 1,3,6,9 \
      --out bench_logs/roofline_r4.json
"""

import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LINE = re.compile(r"# piece (\S+)\s+(\S+)\s+([0-9.]+) ms\s+\((\d+) rows, "
                  r"\s*([0-9.]+) MiB,\s*([0-9.]+) GiB/s,\s*([0-9.]+)% "
                  r"roofline\)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1)
    ap.add_argument("--queries", default="1,3,6,9")
    ap.add_argument("--iterations", type=int, default=3)
    ap.add_argument("--out", default="bench_logs/roofline.json")
    args = ap.parse_args()

    rows = []
    for q in [int(x) for x in args.queries.split(",")]:
        env = dict(os.environ, BALLISTA_PIECE_TIMING="1")
        env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
        p = subprocess.run(
            [sys.executable, "-m", "ballista_tpu.benchmarks.runner",
             "--sf", str(args.sf), "--queries", str(q),
             "--iterations", str(args.iterations)],
            capture_output=True, text=True, cwd=REPO, env=env,
            timeout=7200)
        seen = {}
        for m in LINE.finditer(p.stderr):
            key, label, ms, n, mib, gbps, pct = m.groups()
            # the same piece reports once per dispatch; keep the LAST
            # (warm) observation
            seen[key] = {"query": q, "piece": key, "op": label,
                         "ms": float(ms), "rows": int(n),
                         "mib": float(mib), "gibps": float(gbps),
                         "roofline_pct": float(pct)}
        rows.extend(seen.values())
        done = [l for l in p.stdout.splitlines() if l.startswith(f"q{q:2d}")]
        print(done[-1] if done else f"q{q}: rc={p.returncode}", flush=True)

    rows.sort(key=lambda r: -r["ms"])
    print(f"{'query':>5} {'piece':>10} {'op':20} {'ms':>9} {'MiB':>9} "
          f"{'GiB/s':>8} {'%roof':>6}")
    for r in rows:
        print(f"q{r['query']:>4} {r['piece']:>10} {r['op']:20} "
              f"{r['ms']:9.2f} {r['mib']:9.1f} {r['gibps']:8.1f} "
              f"{r['roofline_pct']:6.1f}")
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"# wrote {args.out} ({len(rows)} pieces)")


if __name__ == "__main__":
    main()
