"""TPC-H benchmark runner (the reference's `tpch.rs benchmark` analog).

Times every query with the dispatch-drain method (K dispatches then a
forced device->host scalar fetch; block_until_ready is not a reliable
fence through the axon relay). Prints a per-query table + JSON summary.

Usage:
  python -m ballista_tpu.benchmarks.runner --sf 1 [--queries 1,3,6] \
      [--iterations 5] [--distributed]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _enable_compile_cache():
    import os

    import jax
    if os.environ.get("BALLISTA_FAULTDUMP"):
        # periodic all-thread stack dumps to stderr: diagnoses relay /
        # compile-service stalls inside long unattended sweeps
        import faulthandler
        faulthandler.dump_traceback_later(
            int(os.environ["BALLISTA_FAULTDUMP"]), repeat=True)
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon sitecustomize captures JAX_PLATFORMS before any user
        # code runs; honor an explicit cpu request through the config API
        jax.config.update("jax_platforms", "cpu")
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


class QueryTimeout(Exception):
    pass


def _oracle_cached(q: int, sf: float, pdt):
    """Oracle result + its wall-ms, cached to disk when
    BALLISTA_ORACLE_CACHE is set: the pandas oracle at SF10 costs 1-8 min
    PER QUERY (q7: 505s, q9: 493s) and its inputs are deterministic
    datagen, so retried sweeps shouldn't re-pay it. The recorded ms is
    the original compute time (kept beside the result) so vs_oracle
    stays honest across cache hits. `pdt` may be the pandas table dict
    or a zero-arg callable returning it (lazily materialized only on a
    cache miss — per-query sweep subprocesses with a warm cache never
    build pandas tables at all)."""
    import json as _json
    import os
    import time as _time

    from .oracle import ORACLES

    cache = os.environ.get("BALLISTA_ORACLE_CACHE")
    path = meta = None
    if cache:
        os.makedirs(cache, exist_ok=True)
        path = os.path.join(cache, f"oracle_sf{sf:g}_q{q}.parquet")
        meta = path + ".json"
        if os.path.exists(path) and os.path.exists(meta):
            import pandas as pd
            with open(meta) as f:
                ms = _json.load(f)["oracle_ms"]
            return pd.read_parquet(path), ms
    if callable(pdt):
        pdt = pdt()
    t0 = _time.time()
    exp = ORACLES[q](pdt)
    ms = (_time.time() - t0) * 1000
    if path:
        try:
            tmp = f"{path}.tmp{os.getpid()}"
            exp.to_parquet(tmp)
            os.replace(tmp, path)
            with open(meta, "w") as f:
                _json.dump({"oracle_ms": round(ms, 1)}, f)
        except Exception:  # noqa: BLE001 - exotic dtype: skip caching
            pass
    return exp, ms


def run(sf: float, queries, iterations: int, distributed: bool,
        lazy_ingest: bool = False, verify: bool = False,
        capacity_mode: str = "bucket", tbl_dir: str = None,
        expected: str = None, query_timeout: int = 0,
        evict_between: bool = False, serial: int = 0,
        dataset_dir: str = None, save_results: str = None):
    import jax
    _enable_compile_cache()
    from .. import batch as B
    from ..client import SessionContext
    from ..client.context import _rebind_scans
    from ..datagen import generate_tpch, register_tpch
    from .queries import TPCH_QUERIES

    # bucket capacities by default: geometric shape tiers hit the
    # persistent compile cache across SF changes <19% apart and keep
    # programs shared between close row counts (VERDICT r1 item 3)
    ctx = SessionContext(capacity_mode=capacity_mode)
    t0 = time.time()
    data = None
    if dataset_dir:
        # out-of-core: chunked parquet part files (datagen --chunks) that
        # are never fully materialized — pair with --serial N so both the
        # host and the device stream one partition at a time (SF100 path)
        import os as _os

        from ..datagen.tpch import TPCH_TABLES
        for name in TPCH_TABLES:
            d = _os.path.join(dataset_dir, name)
            if _os.path.isdir(d):
                ctx.register_parquet_dataset(name, d, TPCH_TABLES[name][1])
        print(f"# dataset mount {time.time() - t0:.1f}s", file=sys.stderr)
    elif tbl_dir:
        # dbgen-format ingest (tpch.rs convert-tpch parity): point at a
        # directory of real dbgen .tbl files for the reference diff
        from ..datagen.tbl import register_tpch_tbl
        register_tpch_tbl(ctx, tbl_dir)
        print(f"# tbl ingest {time.time() - t0:.1f}s", file=sys.stderr)
    else:
        data = generate_tpch(sf)
        register_tpch(ctx, sf, data=data)
        print(f"# datagen {time.time() - t0:.1f}s", file=sys.stderr)

    pdt = None
    if verify and not expected:
        from .oracle import to_pd
        _pdt_cache = {}

        def pdt():
            # lazy: only materialized on an oracle-cache miss (at SF10+
            # building pandas tables costs minutes per process; warm
            # BALLISTA_ORACLE_CACHE sweeps never pay it)
            if "v" not in _pdt_cache:
                t0 = time.time()
                d = data if data is not None else {
                    n: ctx.tables[n].arrow_table for n in ctx.tables}
                _pdt_cache["v"] = to_pd(d)
                print(f"# oracle tables {time.time() - t0:.1f}s",
                      file=sys.stderr)
            return _pdt_cache["v"]

    if not lazy_ingest:
        # lazy_ingest skips the warm pass: tables ingest on first use and
        # the cost lands in that query's compile_s (at SF10+ eagerly
        # dict-encoding every table's comment strings costs minutes)
        t0 = time.time()
        for tp in ctx.tables.values():
            tp._ensure()
        print(f"# ingest {time.time() - t0:.1f}s", file=sys.stderr)

    mesh = None
    if distributed:
        from ..parallel.mesh import make_mesh
        mesh = make_mesh()

    # in-process per-query watchdog: single-process sweeps keep table
    # uploads + compiled pieces shared across queries (isolated
    # subprocesses re-pay the relay upload per query), while SIGALRM
    # still bounds one pathological compile/run. Best-effort: a signal
    # can't always interrupt a blocking PJRT call mid-flight, but it
    # fires at the next Python boundary either way.
    if query_timeout:
        import signal

        def _alarm(signum, frame):
            raise QueryTimeout(f"query exceeded {query_timeout}s")

        signal.signal(signal.SIGALRM, _alarm)

    results = {}
    fn = inputs = ep = out = None
    for q in queries:
        if query_timeout:
            import signal
            signal.alarm(query_timeout)
        # r3 part-B lesson: these locals from the PREVIOUS query pin its
        # compiled program + bound table columns + output on device, so
        # evict_device() freed nothing and q10-q22 all died
        # RESOURCE_EXHAUSTED right after q9 filled HBM. Release before
        # any eviction can work.
        fn = inputs = ep = out = None
        try:
            t0 = time.time()
            from ..planner.optimizer import prune_columns
            # prune before rebinding so the rebind ingests metadata for
            # the scanned columns only (per-column lazy ingest)
            plan = _rebind_scans(prune_columns(ctx.sql(TPCH_QUERIES[q]).plan),
                                 ctx)
            route_n = serial
            if not serial and not distributed:
                # automatic out-of-core routing (no human --serial flag):
                # plans whose predicted peak HBM is well beyond the chip
                # (SF10 q5/q8: XLA wants >16 GB in one piece) go straight
                # to the serial runtime instead of paying a doomed compile
                from ..exec.memory import hbm_budget_bytes, route_serial
                from ..planner.physical import create_physical_plan
                caps = {n: tp.capacity for n, tp in ctx.tables.items()}
                try:
                    route_n = route_serial(
                        create_physical_plan(plan, caps, ctx.options))
                except Exception:  # noqa: BLE001 - estimator must not kill
                    route_n = 0
                if route_n:
                    print(f"q{q:2d}  auto-routed out-of-core "
                          f"(serial@{route_n})", file=sys.stderr, flush=True)

            def _run_serial(n_parts):
                nonlocal out
                import os as _os

                from ..scheduler.serial import execute_serial
                ctx.serial_partitions = n_parts
                t0 = time.time()
                out, out_schema = execute_serial(ctx, plan, n_parts)
                compile_s = time.time() - t0
                # an out-of-core pass re-streams every table shard from
                # parquet through host shuffles (tens of minutes at SF10+)
                # and is I/O-dominated. Default ONE extra timed pass for a
                # clean compile/run split; BALLISTA_SERIAL_PASSES=1 makes
                # the first pass the measurement (its wall includes stage
                # compiles — flagged by compile_s == ms)
                if int(_os.environ.get("BALLISTA_SERIAL_PASSES", "2")) <= 1:
                    return (compile_s, compile_s, int(out.num_rows),
                            out_schema)
                t0 = time.time()
                out, out_schema = execute_serial(ctx, plan, n_parts)
                per_iter = time.time() - t0
                return compile_s, per_iter, int(out.num_rows), out_schema

            if route_n:
                # out-of-core: partition-by-partition on one device with
                # host-RAM shuffles (scheduler/serial.py) — for queries
                # whose single-program working set exceeds HBM (SF10 q5/q8
                # plan a >16GB join buffer)
                compile_s, per_iter, nrows, out_schema = _run_serial(route_n)
            elif distributed:
                from ..scheduler.runtime import execute_distributed
                # distributed path: plan+compile+run per call (stage cache
                # inside the runtime); time end-to-end
                out, schema = execute_distributed(ctx, plan, mesh)
                compile_s = time.time() - t0
                t0 = time.time()
                for _ in range(iterations):
                    out, schema = execute_distributed(ctx, plan, mesh)
                per_iter = (time.time() - t0) / iterations
                nrows = int(out.num_rows)
                out_schema = schema
            else:
                try:
                    # overflow-converged compile (expanding joins re-size
                    # and retry; compiling without the flag silently clips
                    # — q21 at SF>=0.5 gave wrong rows through the old
                    # manual path)
                    fn, inputs, ep, out = ctx.converge_compile(plan,
                                                               pruned=True)
                    nrows = int(out.num_rows)  # drain (compile+warmup)
                    compile_s = time.time() - t0
                    t0 = time.time()
                    for _ in range(iterations):
                        out, _overflow = fn(inputs)
                    nrows = int(out.num_rows)
                    per_iter = (time.time() - t0) / iterations
                    out_schema = ep.schema
                except Exception as e:  # noqa: BLE001
                    if "RESOURCE_EXHAUSTED" not in str(e) and \
                            "exceed memory" not in str(e):
                        raise
                    # borderline plan the router let through: free HBM and
                    # fall back to the out-of-core runtime in-process (the
                    # estimator has ~±30% error by design)
                    import gc

                    import jax as _jax
                    fn = inputs = ep = out = None
                    ctx.evict_device()
                    _jax.clear_caches()
                    gc.collect()
                    from ..exec.memory import (hbm_budget_bytes,
                                               oom_memo_record,
                                               plan_fingerprint,
                                               plan_serial_partitions)
                    est_n = 4
                    try:
                        from ..exec.memory import estimate_plan_hbm
                        from ..planner.physical import create_physical_plan
                        caps = {n: tp.capacity
                                for n, tp in ctx.tables.items()}
                        ep2 = create_physical_plan(plan, caps, ctx.options)
                        est_n = plan_serial_partitions(
                            estimate_plan_hbm(ep2), hbm_budget_bytes())
                        # the OOM just PROVED the estimate low: double the
                        # partition count the model would pick (SF10 q8's
                        # fallback at the modeled serial@4 OOM'd again;
                        # serial@8 fits)
                        est_n = min(est_n * 2, 64)
                        # learned routing: the NEXT process with this plan
                        # shape goes straight to serial
                        oom_memo_record(plan_fingerprint(ep2), est_n)
                    except Exception:  # noqa: BLE001
                        pass
                    print(f"q{q:2d}  in-core OOM; falling back to "
                          f"serial@{est_n}", file=sys.stderr, flush=True)
                    compile_s, per_iter, nrows, out_schema = \
                        _run_serial(est_n)
            results[q] = {"ms": round(per_iter * 1000, 1),
                          "compile_s": round(compile_s, 1), "rows": nrows}
            if save_results:
                # persist the result rows (invariant checks / later diffs
                # at scales where no oracle is feasible)
                import os as _os
                _os.makedirs(save_results, exist_ok=True)
                B.to_pandas(out, out_schema).to_parquet(
                    _os.path.join(save_results, f"q{q}.parquet"))
            extra = ""
            if expected:
                # exact diff vs captured answer files (tpch.rs
                # --expected-results, benchmarks/src/bin/tpch.rs:421-422)
                from ..datagen.tbl import diff_expected
                got = B.to_pandas(out, out_schema)
                mismatch = diff_expected(got, expected, q)
                results[q]["match"] = not mismatch
                extra = (f"  MISMATCH: {mismatch}" if mismatch
                         else "  [== expected]")
            elif verify:
                from .oracle import ORACLES, diff_frames
                got = B.to_pandas(out, out_schema)
                t0 = time.time()
                exp, oracle_ms = _oracle_cached(q, sf, pdt)
                if oracle_ms is None:
                    oracle_ms = (time.time() - t0) * 1000
                mismatch = diff_frames(got, exp)
                results[q]["oracle_ms"] = round(oracle_ms, 1)
                results[q]["vs_oracle"] = round(oracle_ms / max(
                    per_iter * 1000, 1e-3), 1)
                results[q]["match"] = not mismatch
                if mismatch:
                    extra = f"  MISMATCH: {mismatch}"
                else:
                    extra = (f"  [oracle {oracle_ms:8.1f} ms, "
                             f"{results[q]['vs_oracle']}x]")
            print(f"q{q:2d}  {per_iter * 1000:10.1f} ms   "
                  f"(compile {compile_s:6.1f}s, {nrows} rows){extra}",
                  flush=True)
        except Exception as e:  # noqa: BLE001 - keep benching other queries
            results[q] = {"error": f"{type(e).__name__}: {e}"}
            print(f"q{q:2d}  ERROR {type(e).__name__}: {e}", flush=True)
            if "RESOURCE_EXHAUSTED" in str(e):
                # free accumulated device columns so ONE oversized query
                # can't poison the rest of the sweep (SF10 r3: q9's OOM
                # left HBM full and q10-q22 all died instantly)
                import gc

                import jax as _jax
                fn = inputs = ep = out = None
                ctx.evict_device()
                # jit caches pin compiled executables + their constants;
                # cross-query program reuse is worth less than finishing
                _jax.clear_caches()
                gc.collect()
        else:
            if evict_between:
                import gc

                import jax as _jax
                fn = inputs = ep = out = None
                ctx.evict_device()
                _jax.clear_caches()
                gc.collect()
        finally:
            if query_timeout:
                import signal
                signal.alarm(0)
    total = sum(r["ms"] for r in results.values() if "ms" in r)
    print(json.dumps({"sf": sf, "total_ms": round(total, 1),
                      "queries": results}))
    return results


def loadtest(sf: float, clients: int, requests: int, queries):
    """Concurrent-client load test against a StandaloneCluster
    (`tpch.rs loadtest ballista`, benchmarks/src/bin/tpch.rs:454 parity):
    each client thread submits `requests` queries round-robin through the
    scheduler control plane; reports throughput + latency percentiles."""
    import threading

    from ..client import SessionContext
    from ..datagen import register_tpch
    from ..scheduler.standalone import StandaloneCluster
    from .queries import TPCH_QUERIES

    ctx = SessionContext()
    register_tpch(ctx, sf)
    cluster = StandaloneCluster(ctx)
    # warm compile caches once per distinct query
    for q in queries:
        cluster.sql(TPCH_QUERIES[q])

    latencies = []
    lock = threading.Lock()
    # the scheduler pump + device are serial resources in-process; the
    # submit lock models the single-controller gRPC frontier (queueing
    # latency is part of what the load test measures)
    submit = threading.Lock()

    def client(cid: int):
        for i in range(requests):
            q = queries[(cid + i) % len(queries)]
            t0 = time.time()
            with submit:
                cluster.sql(TPCH_QUERIES[q])
            dt = time.time() - t0
            with lock:
                latencies.append(dt)

    t0 = time.time()
    threads = [threading.Thread(target=client, args=(c,))
               for c in range(clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0
    latencies.sort()
    n = len(latencies)
    out = {"clients": clients, "requests_per_client": requests,
           "total_queries": n, "wall_s": round(wall, 2),
           "qps": round(n / wall, 2),
           "p50_ms": round(latencies[n // 2] * 1000, 1),
           "p95_ms": round(latencies[int(n * 0.95)] * 1000, 1),
           "max_ms": round(latencies[-1] * 1000, 1)}
    print(json.dumps(out))
    return out


def run_isolated(sf: float, queries, iterations: int, distributed: bool,
                 per_query_timeout: int, verify: bool = False,
                 lazy_ingest: bool = False):
    """Each query in its own subprocess with a hard timeout: one
    pathological compile can't consume the whole suite's budget (the
    reference's tpch.rs runs queries sequentially in-process; compile
    latency makes isolation worth having here)."""
    import json as _json
    import subprocess

    results = {}
    for q in queries:
        cmd = [sys.executable, "-m", "ballista_tpu.benchmarks.runner",
               "--sf", str(sf), "--queries", str(q),
               "--iterations", str(iterations)]
        if distributed:
            cmd.append("--distributed")
        if verify:
            cmd.append("--verify")
        if lazy_ingest:
            cmd.append("--lazy-ingest")
        try:
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=per_query_timeout)
            line = [l for l in out.stdout.splitlines()
                    if l.startswith("{")][-1]
            results[q] = _json.loads(line)["queries"][str(q)]
            print(out.stdout.splitlines()[0], flush=True)
        except subprocess.TimeoutExpired:
            results[q] = {"error": f"timeout>{per_query_timeout}s"}
            print(f"q{q:2d}  TIMEOUT >{per_query_timeout}s", flush=True)
        except Exception as e:  # noqa: BLE001
            results[q] = {"error": f"{type(e).__name__}: {e}"}
            print(f"q{q:2d}  ERROR {type(e).__name__}: {e}", flush=True)
    total = sum(r["ms"] for r in results.values() if "ms" in r)
    print(json.dumps({"sf": sf, "total_ms": round(total, 1),
                      "queries": results}))
    return results


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--queries", default=None,
                    help="comma-separated query numbers (default: all)")
    ap.add_argument("--iterations", type=int, default=3)
    ap.add_argument("--distributed", action="store_true")
    ap.add_argument("--lazy-ingest", action="store_true",
                    help="skip the eager table-ingest warm pass")
    ap.add_argument("--isolate", type=int, default=None, metavar="SECONDS",
                    help="run each query in a subprocess with this timeout")
    ap.add_argument("--query-timeout", type=int, default=0, metavar="SECONDS",
                    help="in-process SIGALRM per-query timeout (keeps table "
                         "uploads shared, unlike --isolate)")
    ap.add_argument("--serial", type=int, default=0, metavar="N",
                    help="out-of-core: run each query partition-by-"
                         "partition over N partitions on one device "
                         "(scheduler/serial.py) — for working sets "
                         "beyond HBM")
    ap.add_argument("--evict-between", action="store_true",
                    help="free device columns after every query (HBM-tight "
                         "scale factors; host ingest is kept and re-uploads "
                         "lazily)")
    ap.add_argument("--tbl-dir", default=None,
                    help="ingest dbgen .tbl files from this directory "
                         "instead of the native datagen")
    ap.add_argument("--dataset-dir", default=None,
                    help="mount chunked parquet part files (datagen "
                         "--chunks layout) as out-of-core tables; pair "
                         "with --serial N (SF100 path)")
    ap.add_argument("--save-results", default=None, metavar="DIR",
                    help="write each query's result rows to DIR/q{n}.parquet")
    ap.add_argument("--expected", default=None, metavar="DIR",
                    help="EXACT-diff results vs DIR/answers/q{n}.out "
                         "(tpch.rs --expected-results parity)")
    ap.add_argument("--verify", action="store_true",
                    help="diff results against the pandas oracle and "
                         "record its per-query time as the baseline")
    ap.add_argument("--capacity-mode", default="bucket",
                    choices=("exact", "bucket"))
    ap.add_argument("--loadtest", default=None, metavar="CLIENTSxREQUESTS",
                    help="e.g. 4x8: 4 concurrent clients, 8 requests each")
    args = ap.parse_args(argv)
    queries = ([int(x) for x in args.queries.split(",")] if args.queries
               else list(range(1, 23)))
    if args.loadtest:
        c, r = args.loadtest.lower().split("x")
        loadtest(args.sf, int(c), int(r), queries)
    elif args.isolate:
        run_isolated(args.sf, queries, args.iterations, args.distributed,
                     args.isolate, verify=args.verify,
                     lazy_ingest=args.lazy_ingest)
    else:
        run(args.sf, queries, args.iterations, args.distributed,
            lazy_ingest=args.lazy_ingest, verify=args.verify,
            capacity_mode=args.capacity_mode, tbl_dir=args.tbl_dir,
            expected=args.expected, query_timeout=args.query_timeout,
            evict_between=args.evict_between, serial=args.serial,
            dataset_dir=args.dataset_dir, save_results=args.save_results)


if __name__ == "__main__":
    main()
