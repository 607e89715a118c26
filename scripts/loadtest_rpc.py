"""Multi-executor load test against the network scheduler.

Reference parity: `tpch.rs loadtest ballista` (benchmarks/src/bin/tpch.rs:454)
— concurrent clients x requests against a real cluster. Here the cluster is
the JSON-HTTP SchedulerRpcService plus N executor worker PROCESSES (pull
mode), with one worker SIGKILLed mid-run to exercise heartbeat-expiry
recovery under load. Every response is diffed against a precomputed pandas
answer; reports jobs/s + latency percentiles.

Usage:
  JAX_PLATFORMS=cpu python scripts/loadtest_rpc.py \
      [--clients 4] [--requests 6] [--workers 3] [--kill-one]
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_PART = 4
SF = 0.005
TABLES = {"kind": "tpch", "sf": SF}
QUERIES = {
    "join_agg": """
        select o_orderpriority, count(*) as n
        from orders join customer on o_custkey = c_custkey
        where o_totalprice > 1000
        group by o_orderpriority order by o_orderpriority""",
    "filter_agg": """
        select sum(l_extendedprice * l_discount) as revenue
        from lineitem
        where l_discount between 0.05 and 0.07 and l_quantity < 24""",
    "group_sort": """
        select l_returnflag, l_linestatus, sum(l_quantity) as sum_qty,
               count(*) as n
        from lineitem group by l_returnflag, l_linestatus
        order by l_returnflag, l_linestatus""",
}


def _expected():
    import pandas as pd

    from ballista_tpu.datagen import generate_tpch
    data = {k: t.to_pandas() for k, t in generate_tpch(SF).items()}
    o, c, li = data["orders"], data["customer"], data["lineitem"]
    for col in ("o_totalprice",):
        o[col] = o[col].astype(float)
    for col in ("l_extendedprice", "l_discount", "l_quantity"):
        li[col] = li[col].astype(float)
    out = {}
    m = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    m = m[m.o_totalprice > 1000]
    out["join_agg"] = (m.groupby("o_orderpriority").size()
                       .reset_index(name="n")
                       .sort_values("o_orderpriority")
                       .reset_index(drop=True))
    f = li[(li.l_discount >= 0.05) & (li.l_discount <= 0.07)
           & (li.l_quantity < 24)]
    out["filter_agg"] = float((f.l_extendedprice * f.l_discount).sum())
    out["group_sort"] = (li.groupby(["l_returnflag", "l_linestatus"])
                         .agg(sum_qty=("l_quantity", "sum"),
                              n=("l_quantity", "size"))
                         .reset_index()
                         .sort_values(["l_returnflag", "l_linestatus"])
                         .reset_index(drop=True))
    return out


def _check(name, got, exp):
    if name == "filter_agg":
        return abs(float(got["revenue"][0]) - exp) < 1e-2
    if name == "join_agg":
        return ([str(x) for x in got["o_orderpriority"]]
                == [str(x) for x in exp["o_orderpriority"]]
                and [int(x) for x in got["n"]] == [int(x) for x in exp["n"]])
    return ([int(x) for x in got["n"]] == [int(x) for x in exp["n"]]
            and [round(float(x), 2) for x in got["sum_qty"]]
            == [round(float(x), 2) for x in exp["sum_qty"]])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=4)
    ap.add_argument("--requests", type=int, default=6)
    ap.add_argument("--workers", type=int, default=3)
    ap.add_argument("--kill-one", action="store_true", default=True)
    ap.add_argument("--no-kill", dest="kill_one", action="store_false")
    args = ap.parse_args()

    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from ballista_tpu.scheduler.rpc import SchedulerRpcClient, serve_scheduler

    work_dir = tempfile.mkdtemp(prefix="loadtest_")
    service, httpd = serve_scheduler(work_dir, executor_timeout_s=5.0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"

    env = dict(os.environ, JAX_PLATFORMS="cpu",
               JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache_cpu",
               XLA_FLAGS=f"--xla_force_host_platform_device_count={N_PART}")
    procs = []
    for i in range(args.workers):
        p = subprocess.Popen(
            [sys.executable, "-m", "ballista_tpu.scheduler.executor_process",
             "--scheduler", url, "--executor-id", f"lt-{i}",
             "--devices", str(N_PART), "--poll-ms", "50",
             "--heartbeat-s", "1"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        deadline = time.time() + 120
        while time.time() < deadline:
            line = p.stdout.readline()
            if "EXECUTOR_READY" in line:
                break
            if p.poll() is not None:
                raise RuntimeError(f"worker lt-{i} died at startup")
        procs.append(p)
    print(f"# {args.workers} workers up at {url}", flush=True)

    exp = _expected()
    names = list(QUERIES)
    # warm the compile caches once per distinct query shape
    warm = SchedulerRpcClient(url)
    for name in names:
        jid = warm.submit_sql(QUERIES[name], TABLES,
                              options={"n_partitions": N_PART})
        got = warm.wait(jid, timeout_s=600)
        assert _check(name, got, exp[name]), f"warmup {name} mismatch"
    print("# warmup verified", flush=True)

    results = []
    lock = threading.Lock()

    def client_thread(cid):
        cl = SchedulerRpcClient(url)
        for i in range(args.requests):
            name = names[(cid + i) % len(names)]
            t0 = time.time()
            try:
                jid = cl.submit_sql(QUERIES[name], TABLES,
                                    options={"n_partitions": N_PART})
                got = cl.wait(jid, timeout_s=600)
                ok = _check(name, got, exp[name])
            except Exception as e:  # noqa: BLE001
                ok, jid = False, f"error:{e}"
            with lock:
                results.append((name, ok, time.time() - t0))

    t0 = time.time()
    threads = [threading.Thread(target=client_thread, args=(c,))
               for c in range(args.clients)]
    for t in threads:
        t.start()
    if args.kill_one:
        time.sleep(2.0)
        procs[0].send_signal(signal.SIGKILL)
        print("# killed worker lt-0 mid-run", flush=True)
    for t in threads:
        t.join()
    wall = time.time() - t0

    lats = sorted(r[2] for r in results)
    n_ok = sum(1 for r in results if r[1])
    out = {"clients": args.clients, "requests_per_client": args.requests,
           "workers": args.workers, "killed_one": args.kill_one,
           "total_queries": len(results), "correct": n_ok,
           "wall_s": round(wall, 2),
           "jobs_per_s": round(len(results) / wall, 2),
           "p50_s": round(lats[len(lats) // 2], 2),
           "p95_s": round(lats[int(len(lats) * 0.95)], 2),
           "max_s": round(lats[-1], 2)}
    print(json.dumps(out), flush=True)
    for p in procs:
        p.kill()
    httpd.shutdown()
    assert n_ok == len(results), "some responses were wrong or failed"


if __name__ == "__main__":
    main()
