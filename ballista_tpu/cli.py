"""Interactive SQL REPL.

Reference parity: `ballista-cli` (SURVEY.md §2.4 — a datafusion-cli-based
REPL with meta commands). Same command surface:

  \\q                quit            \\?                help
  \\d                list tables     \\d <table>        describe table
  \\timing on|off    toggle timing   \\pset format ...  output format
  \\set key value    session config  \\explain <sql>    show plans
  \\h                list functions  \\h <pattern>      search functions
  \\quiet on|off     quiet mode

Run:  python -m ballista_tpu.cli [--sf F] [--parquet DIR] [--distributed]
      [-f script.sql] [--plugin-dir DIR]
"""

from __future__ import annotations

import argparse
import sys
import time


HELP = __doc__.split("Run:")[0]


def _remote_tables_spec(args) -> dict:
    """Map CLI data flags to a wire data-environment spec (serde/tasks)."""
    if args.sf:
        return {"kind": "tpch", "sf": args.sf}
    if args.parquet:
        import glob
        import os
        tables = {}
        for path in sorted(glob.glob(os.path.join(args.parquet,
                                                  "*.parquet"))):
            name = os.path.splitext(os.path.basename(path))[0]
            tables[name] = {"format": "parquet", "path": os.path.abspath(path),
                            "primary_key": None}
        for d in sorted(glob.glob(os.path.join(args.parquet, "*/"))):
            name = os.path.basename(d.rstrip("/"))
            tables[name] = {"format": "parquet_dataset",
                            "path": os.path.abspath(d), "primary_key": None}
        return {"kind": "files", "tables": tables}
    raise SystemExit("--connect needs a data environment: --sf or --parquet")


class RemoteSession:
    """SessionContext-shaped adapter over the scheduler RPC wire
    (BallistaContext::remote, ballista-cli --host/--port parity): SQL
    parses/plans client-side against the named data environment, ships as
    a serialized plan, and results stream back as Arrow IPC."""

    def __init__(self, url: str, tables_spec: dict):
        from .scheduler.rpc import SchedulerRpcClient
        from .serde.tasks import build_context
        self.client = SchedulerRpcClient(url)
        self.tables_spec = tables_spec
        self._local = build_context(tables_spec)  # schemas for planning
        self.options = {}

    @property
    def tables(self):
        return self._local.tables

    def sql(self, query: str):
        session = self

        class _RemoteDF:
            def __init__(self):
                # plan eagerly so \explain and errors surface locally
                self.plan = session._local.sql(query).plan

            def to_pandas(self):
                job_id = session.client.submit_sql(
                    query, session.tables_spec, options=session.options,
                    ctx=session._local)
                return session.client.wait(job_id)

        return _RemoteDF()

    def take_warnings(self):
        return self._local.take_warnings()


class Repl:
    def __init__(self, ctx, distributed: bool = False, mesh=None):
        self.ctx = ctx
        self.distributed = distributed
        self.mesh = mesh
        self.timing = True
        self.fmt = "table"
        self.quiet = False

    def execute_sql(self, sql: str):
        t0 = time.time()
        # distributed mode is handled inside the context (standalone cluster)
        try:
            df = self.ctx.sql(sql).to_pandas()
        except ValueError as e:
            if "no SELECT statement" in str(e):
                return  # DDL-only statement (CREATE TABLE/VIEW, DROP, ...)
            raise
        elapsed = time.time() - t0
        if not self.quiet:
            self.print_df(df)
        for w in self.ctx.take_warnings():
            print(f"WARNING: {w}", file=sys.stderr)
        if self.timing and not self.quiet:
            print(f"{len(df)} row(s) in {elapsed:.3f}s")

    def print_df(self, df):
        if self.fmt == "csv":
            print(df.to_csv(index=False), end="")
        elif self.fmt == "json":
            print(df.to_json(orient="records", lines=True))
        else:
            print(df.to_string(index=False))

    def handle_meta(self, line: str) -> bool:
        """Returns False to quit."""
        parts = line.split()
        cmd = parts[0]
        if cmd in ("\\q", "\\quit"):
            return False
        if cmd == "\\?":
            print(HELP)
        elif cmd == "\\d":
            if len(parts) == 1:
                for name in sorted(self.ctx.tables):
                    tp = self.ctx.tables[name]
                    print(f"{name}  ({tp.arrow_table.num_rows} rows)")
                for name in sorted(getattr(self.ctx, "views", {})):
                    print(f"{name}  (view)")
            else:
                tp = self.ctx.tables.get(parts[1])
                if tp is None:
                    print(f"no such table: {parts[1]}")
                else:
                    for f in tp.schema.fields:
                        print(f"  {f.name}: {f.dtype!r}"
                              f"{'' if f.nullable else ' not null'}")
        elif cmd == "\\timing":
            self.timing = len(parts) < 2 or parts[1] == "on"
            print(f"timing {'on' if self.timing else 'off'}")
        elif cmd == "\\quiet":
            # QuietMode (ballista-cli command.rs:36)
            self.quiet = len(parts) < 2 or parts[1] == "on"
            print(f"quiet {'on' if self.quiet else 'off'}")
        elif cmd == "\\h":
            # ListFunctions / SearchFunctions (command.rs:36)
            from .functions import list_functions, search_functions
            fns = (search_functions(parts[1]) if len(parts) > 1
                   else list_functions())
            for f in fns:
                print(f"  {f.signature:55s} [{f.kind}] {f.description}")
        elif cmd == "\\pset":
            if len(parts) >= 3 and parts[1] == "format":
                self.fmt = parts[2]
        elif cmd == "\\set":
            # session config (BallistaConfig surface)
            from .config import BallistaConfig
            cfg = getattr(self.ctx, "config", None) or BallistaConfig()
            try:
                cfg.set(parts[1], parts[2])
                self.ctx.config = cfg
                if parts[1] == "ballista.capacity.mode":
                    # applies to tables registered from now on
                    self.ctx.capacity_mode = cfg.capacity_mode()
                print(f"{parts[1]} = {parts[2]}")
            except KeyError as e:
                print(e)
        elif cmd == "\\explain":
            sql = line[len("\\explain"):].strip()
            df_api = self.ctx.sql(sql)
            print("Logical plan:")
            print(df_api.plan.display())
            if self.distributed:
                from .scheduler.distributed_planner import (DistOptions,
                                                            DistributedPlanner)
                n = self.mesh.devices.size if self.mesh else 8
                dp = DistributedPlanner(self.ctx, DistOptions(n_partitions=n))
                print("Distributed stages:")
                print(dp.plan(df_api.plan).display())
        else:
            print(f"unknown command {cmd}; try \\?")
        return True

    def run(self):
        buf = []
        while True:
            try:
                prompt = "ballista> " if not buf else "      -> "
                line = input(prompt)
            except (EOFError, KeyboardInterrupt):
                print()
                break
            if not line.strip():
                continue
            if line.strip().startswith("\\") and not buf:
                if not self.handle_meta(line.strip()):
                    break
                continue
            buf.append(line)
            if line.rstrip().endswith(";"):
                sql = "\n".join(buf)
                buf = []
                try:
                    self.execute_sql(sql)
                except Exception as e:  # noqa: BLE001 - REPL survives errors
                    print(f"Error: {type(e).__name__}: {e}")


def main(argv=None):
    ap = argparse.ArgumentParser(description="ballista_tpu SQL REPL")
    ap.add_argument("--sf", type=float, default=None,
                    help="generate + register TPC-H data at this scale factor")
    ap.add_argument("--parquet", default=None,
                    help="register every parquet file in DIR as a table")
    ap.add_argument("--csv", default=None,
                    help="register every csv file in DIR as a table")
    ap.add_argument("--distributed", action="store_true",
                    help="execute over the device mesh (all local devices)")
    ap.add_argument("-c", "--command", default=None,
                    help="run one SQL command and exit")
    ap.add_argument("-f", "--file", default=None,
                    help="execute a SQL script file and exit "
                    "(';'-separated statements)")
    ap.add_argument("--plugin-dir", default=None,
                    help="load UDF plugin modules from this directory")
    ap.add_argument("--quiet", action="store_true",
                    help="suppress result output (timing-only runs)")
    ap.add_argument("--format", default="table",
                    choices=["table", "csv", "json"])
    ap.add_argument("--connect", default=None, metavar="URL",
                    help="execute against a REMOTE scheduler RPC service "
                         "(ballista-cli --host/--port parity): queries "
                         "submit over the wire and results stream back; "
                         "pair with --sf or --parquet to name the shared "
                         "data environment the executors mount")
    args = ap.parse_args(argv)

    if args.connect:
        ctx = RemoteSession(args.connect, _remote_tables_spec(args))
    else:
        from .client import SessionContext

        ctx = SessionContext(distributed=args.distributed)
    if args.sf and not args.connect:
        from .datagen import register_tpch
        print(f"generating TPC-H SF{args.sf} ...", file=sys.stderr)
        register_tpch(ctx, args.sf)
    if args.parquet and not args.connect:
        import glob
        import os
        for path in sorted(glob.glob(os.path.join(args.parquet, "*.parquet"))):
            name = os.path.splitext(os.path.basename(path))[0]
            ctx.register_parquet(name, path)
            print(f"registered {name}", file=sys.stderr)
    if args.csv and not args.connect:
        import glob
        import os
        for path in sorted(glob.glob(os.path.join(args.csv, "*.csv"))):
            name = os.path.splitext(os.path.basename(path))[0]
            ctx.register_csv(name, path)
            print(f"registered {name}", file=sys.stderr)

    if args.plugin_dir and not args.connect:
        loaded = ctx.load_plugins(args.plugin_dir)
        print(f"loaded plugins: {', '.join(loaded) or '(none)'}",
              file=sys.stderr)

    mesh = None
    if args.distributed:
        from .parallel.mesh import make_mesh
        mesh = make_mesh()
    repl = Repl(ctx, args.distributed, mesh)
    repl.fmt = args.format
    repl.quiet = args.quiet
    if args.command:
        repl.execute_sql(args.command)
        return
    if args.file:
        # exec.rs file-execution parity: run each ';'-terminated statement
        with open(args.file) as fh:
            script = fh.read()
        for stmt in [s.strip() for s in script.split(";") if s.strip()]:
            repl.execute_sql(stmt)
        return
    print("ballista_tpu SQL REPL — \\? for help, \\q to quit")
    repl.run()


if __name__ == "__main__":
    main()
