#!/usr/bin/env bash
# Round-5 post-fix chip chain, in priority order:
#   1. SF10 in-core attempts for the four queries the router kept off the
#      chip (q5/q8 previously OOM'd — the padded-gather fix should let
#      them fit; q9/q10 were mis-routed serial by the over-approximating
#      estimator). BALLISTA_ROUTE_FACTOR=0 disables auto-routing.
#   2. Warm-cache SF10 re-sweep: steady-state numbers for all 22.
#   3. Roofline accounting at SF1 (piece timing).
#   4. SF100 out-of-core sweep with invariant verification.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
export BALLISTA_ORACLE_CACHE=/root/oracle_sf10

echo "=== SF10 in-core attempts $(date)"
BALLISTA_ROUTE_FACTOR=0 python scripts/sf10_sweep.py --sf 10 \
    --dataset-dir /root/tpch_sf10 --oracle-cache /root/oracle_sf10 \
    --queries 5,8,9,10 --timeout 5400 \
    --out bench_logs/sf10_r5_incore > bench_logs/sf10_r5_incore.log 2>&1 \
    || echo "incore rc=$?"

echo "=== warm SF10 re-sweep $(date)"
python scripts/sf10_sweep.py --sf 10 --dataset-dir /root/tpch_sf10 \
    --oracle-cache /root/oracle_sf10 --timeout 4500 \
    --out bench_logs/sf10_r5_warm > bench_logs/sf10_r5_warm.log 2>&1 \
    || echo "warm rc=$?"

echo "=== roofline SF1 $(date)"
BALLISTA_ORACLE_CACHE=/root/oracle_sf1 \
python scripts/roofline.py --sf 1 --queries 1,3,6,9,18 --iterations 3 \
    --out bench_logs/roofline_r5.json > bench_logs/roofline_r5.log 2>&1 \
    || echo "roofline rc=$?"

echo "=== SF100 sweep $(date)"
unset BALLISTA_ORACLE_CACHE
python scripts/sf100_sweep.py --dataset-dir /root/tpch_sf100 --sf 100 \
    --sf10-oracle /root/oracle_sf10 --timeout 10800 \
    --out bench_logs/sf100_r5 > bench_logs/sf100_r5.log 2>&1 \
    || echo "sf100 rc=$?"
echo "=== chain done $(date)"
