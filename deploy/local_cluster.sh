#!/usr/bin/env bash
# Runnable local cluster: scheduler RPC service + N executor workers as
# real separate processes on this host, then a smoke query over the wire.
# The process-level analog of docker-compose.yml (and the thing CI can
# actually run without docker). Mirrors the reference's
# dev/docker-compose + benchmark-client flow.
#
#   deploy/local_cluster.sh [n_workers] [pull|push]
set -euo pipefail
cd "$(dirname "$0")/.."

WORKERS="${1:-2}"
POLICY="${2:-push}"
WORK_DIR="$(mktemp -d /tmp/ballista_cluster.XXXX)"
# force the CPU platform: the host env often pins JAX_PLATFORMS to the
# real accelerator, and a smoke cluster must never contend for its HBM
# (override with BALLISTA_CLUSTER_PLATFORM=tpu on a dedicated slice)
export JAX_PLATFORMS="${BALLISTA_CLUSTER_PLATFORM:-cpu}"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache_cpu}"
export XLA_FLAGS="--xla_force_host_platform_device_count=4"

PIDS=()
cleanup() {
  for pid in "${PIDS[@]}"; do kill "$pid" 2>/dev/null || true; done
}
trap cleanup EXIT

python - "$WORK_DIR" "$POLICY" <<'PY' &
import os, sys, threading, time
import jax
# the host sitecustomize may pin the real accelerator regardless of the
# env var; the config API wins (same dance as benchmarks/runner.py)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
from ballista_tpu.scheduler.rpc import serve_scheduler
service, httpd = serve_scheduler(sys.argv[1], host="127.0.0.1",
                                 port=50050, policy=sys.argv[2])
print("SCHEDULER_READY", flush=True)
httpd.serve_forever()
PY
PIDS+=($!)
sleep 2

for i in $(seq 1 "$WORKERS"); do
  python -m ballista_tpu.scheduler.executor_process \
    --scheduler http://127.0.0.1:50050 --executor-id "local-$i" \
    --devices 4 --policy "$POLICY" --heartbeat-s 2 &
  PIDS+=($!)
done
sleep 3

python - <<'PY'
from ballista_tpu.scheduler.rpc import SchedulerRpcClient
# generous HTTP timeout: fresh stage compiles on a busy host can hold
# the scheduler's verb lock for tens of seconds
client = SchedulerRpcClient("http://127.0.0.1:50050", timeout=300)
job = client.submit_sql(
    "select o_orderpriority, count(*) n from orders "
    "join customer on o_custkey = c_custkey group by o_orderpriority "
    "order by o_orderpriority",
    {"kind": "tpch", "sf": 0.01}, options={"n_partitions": 4})
df = client.wait(job, timeout_s=600)
print(df)
assert len(df) == 5 and int(df["n"].sum()) > 0
print("CLUSTER_SMOKE_OK")
PY
