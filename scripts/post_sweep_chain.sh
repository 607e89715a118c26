#!/usr/bin/env bash
# Post-sweep chip work, in priority order (run after sf10_sweep.py exits):
#   1. warm-cache SF10 re-sweep (steady-state numbers; compile cache hot)
#   2. roofline accounting at SF1 (q1/q3/q6/q9 per-operator %HBM)
#   3. SF100 out-of-core sweep with invariant verification
# Each step logs under bench_logs/ and failures don't stop the chain.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
export BALLISTA_ORACLE_CACHE=/root/oracle_sf10

echo "=== roofline SF1 $(date)"
python scripts/roofline.py --sf 1 --queries 1,3,6,9 --iterations 3 \
    --out bench_logs/roofline_r4.json > bench_logs/roofline_r4.log 2>&1 \
    || echo "roofline rc=$?"

echo "=== warm SF10 re-sweep $(date)"
python scripts/sf10_sweep.py --sf 10 --dataset-dir /root/tpch_sf10 \
    --oracle-cache /root/oracle_sf10 --timeout 4500 \
    --out bench_logs/sf10_r4_warm > bench_logs/sf10_r4_warm.log 2>&1 \
    || echo "warm sweep rc=$?"

echo "=== SF100 sweep $(date)"
unset BALLISTA_ORACLE_CACHE
python scripts/sf100_sweep.py --dataset-dir /root/tpch_sf100 --sf 100 \
    --sf10-oracle /root/oracle_sf10 --timeout 10800 \
    --out bench_logs/sf100_r4 > bench_logs/sf100_r4.log 2>&1 \
    || echo "sf100 rc=$?"
echo "=== chain done $(date)"
