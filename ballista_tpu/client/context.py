"""SessionContext — the user entry point.

Reference parity: `BallistaContext` (`ballista/client/src/context.rs:87,143`):
register_csv/register_parquet/register_arrow, sql(), DataFrame creation.
Local mode executes plans in-process (the `standalone` mode analog,
`standalone.rs:42`); distributed mode hands the plan to the scheduler
(`scheduler` package) which splits it into stages over the device mesh.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import numpy as np

from .. import batch as B
from ..planner import logical as L
from ..planner.physical import PhysicalOptions, create_physical_plan
from ..exec.plan import compile_stage
from .dataframe import DataFrame


class TableProvider:
    """A registered table: pyarrow Table + per-column lazily-converted
    device columns.

    Ingest is PER COLUMN: a pruned scan of 4 of lineitem's 16 columns
    transfers (and dictionary-encodes) exactly those 4 — at SF10 a full
    eager ingest of lineitem alone is ~8.6 GB of HBM, over half the chip
    (the reference never materializes unused columns either: DataFusion
    parquet scans push projections down)."""

    def __init__(self, name: str, arrow_table, primary_key=None,
                 bucket: bool = False):
        self.name = name
        self.arrow_table = arrow_table
        self.primary_key = tuple(primary_key) if primary_key else None
        self.bucket = bucket
        self._cols: dict = {}          # column name -> device Column
        self._host: dict = {}          # column name -> (values, validity)
        self._dicts: dict = {}
        self._bounds: dict = {}
        self._unsorted: set = set()
        self._fields = None
        self._inferred_unique = None

    @property
    def num_rows(self) -> int:
        return self.arrow_table.num_rows

    @property
    def capacity(self) -> int:
        n = self.num_rows
        return B.bucket_capacity(n) if self.bucket else B.round_capacity(n)

    def _column(self, name: str):
        """Full column accessor; ParquetDatasetProvider overrides to read
        one column from the part files without materializing the table."""
        return self.arrow_table.column(name)

    def _arrow_schema(self):
        return self.arrow_table.schema

    def _field_list(self):
        if self._fields is None:
            self._fields = B.schema_from_arrow(self._arrow_schema()).fields
        return self._fields

    @property
    def schema(self):
        """Schema with ingest-time metadata.

        Small tables (<= BALLISTA_EAGER_META_ROWS, default 5M) ensure
        every string column's dictionary here — expression binding at
        LOGICAL plan time (CASE/LIKE dtype inference, set-op null-safe
        keys) may need any of them. Big tables ensure lazily: referenced
        columns are ensured by `SessionContext.sql`'s lexical pre-pass
        and by `_rebind_scans` after pruning — eagerly encoding every
        string column cost ~80 s of every SF10 query (lineitem's
        unreferenced 2.2 GB l_comment et al). Device transfer stays
        per-column lazy either way (bind_inputs)."""
        from ..schema import Schema, TypeKind
        eager = int(os.environ.get("BALLISTA_EAGER_META_ROWS", "5000000"))
        if self.num_rows <= eager:
            self.ensure_meta([f.name for f in self._field_list()
                              if f.dtype.kind is TypeKind.STRING])
        return Schema(self._field_list(), dict(self._dicts),
                      dict(self._bounds), set(self._unsorted))

    def ensure_meta(self, names) -> None:
        """Host half only: dictionaries / int bounds / raw-mode flags —
        what expression binding needs. No device transfer (the mesh and
        serial runtimes ingest shards themselves from arrow).

        Columns ingest in a small thread pool: parquet decode and the
        numpy/pyarrow encode kernels release the GIL, so a 7-column SF10
        scan reads ~3.4 GB at disk speed instead of column-at-a-time
        (BALLISTA_INGEST_WORKERS, default 4)."""
        fields = {f.name: f for f in self._field_list()}
        n = self.num_rows
        todo = [name for name in dict.fromkeys(names)
                if name not in self._cols and name not in self._host]
        if not todo:
            return

        def ingest(name):
            return name, B.ingest_column_host(self._column(name),
                                              fields[name], n)

        workers = min(int(os.environ.get("BALLISTA_INGEST_WORKERS", "4")),
                      len(todo))
        if workers > 1:
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(max_workers=workers) as ex:
                results = list(ex.map(ingest, todo))
        else:
            results = [ingest(name) for name in todo]
        for name, (values, validity, dict_np, is_raw, bounds) in results:
            if dict_np is not None:
                self._dicts[name] = dict_np
            if is_raw:
                self._unsorted.add(name)
            if bounds is not None:
                self._bounds[name] = bounds
            self._host[name] = (values, validity, fields[name].dtype)

    def ensure_columns(self, names) -> None:
        self.ensure_meta(names)
        for name in names:
            if name in self._cols:
                continue
            # host arrays are KEPT (host RAM is plentiful): evict_device
            # can then free HBM between queries and re-upload on demand
            values, validity, dtype = self._host[name]
            self._cols[name] = B.make_column(values, validity, dtype,
                                             self.capacity)

    def evict_device(self) -> None:
        """Drop device-resident columns, keeping host-side ingest: frees
        HBM between queries in big sweeps (at SF10 the accumulated
        scanned columns of 8 queries filled the 16 GB chip and every
        later query died RESOURCE_EXHAUSTED). Columns re-upload lazily
        on next use."""
        self._cols.clear()

    def column_batch(self, names) -> "B.Batch":
        """Device batch of exactly `names`, in order."""
        import jax.numpy as jnp
        self.ensure_columns(names)
        return B.Batch(tuple(self._cols[c] for c in names),
                       jnp.int32(self.num_rows))

    @property
    def batch(self):
        return self.column_batch([f.name for f in self._field_list()])

    def _ensure(self):
        self.ensure_columns([f.name for f in self._field_list()])


class ParquetDatasetProvider(TableProvider):
    """Out-of-core table: a directory of parquet part files (the chunked
    datagen layout, datagen --chunks) that is never fully materialized in
    host RAM.

    The host-level half of the SF100 story (the mesh/serial runtimes are
    the DEVICE-level half): row counts and schema come from parquet
    metadata; plan-time column metadata (dictionaries/bounds) streams one
    COLUMN at a time; the serial out-of-core runtime scans one row-range
    at a time via `range_table`, which reads only the overlapping part
    files. The reference's executors equally scan parquet partitions
    straight from shared storage (DataFusion ParquetExec's partitioned
    scan + projection/row-group pruning)."""

    def __init__(self, name: str, directory: str, primary_key=None,
                 bucket: bool = False):
        import glob

        import pyarrow.parquet as pq
        files = sorted(glob.glob(os.path.join(directory, "*.parquet")))
        if not files:
            raise FileNotFoundError(f"no parquet part files in {directory}")
        self.files = files
        self._file_rows = []
        for f in files:
            self._file_rows.append(pq.ParquetFile(f).metadata.num_rows)
        self._schema = pq.ParquetFile(files[0]).schema_arrow
        self._n = sum(self._file_rows)
        super().__init__(name, arrow_table=None, primary_key=primary_key,
                         bucket=bucket)

    @property
    def num_rows(self) -> int:
        return self._n

    def _arrow_schema(self):
        return self._schema

    def _column(self, name: str):
        """One full column across all part files (a single column fits
        host RAM at scales where the whole table does not)."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        chunks = [pq.read_table(f, columns=[name]).column(name)
                  for f in self.files]
        return pa.chunked_array([c for ch in chunks for c in ch.chunks])

    def range_table(self, lo: int, hi: int, columns=None):
        """Global row range [lo, hi) reading only overlapping part files
        (row-group granularity within a file via parquet's reader)."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        pieces, start = [], 0
        for f, n in zip(self.files, self._file_rows):
            end = start + n
            if end > lo and start < hi:
                t = pq.read_table(f, columns=list(columns) if columns
                                  else None)
                pieces.append(t.slice(max(lo - start, 0),
                                      min(hi, end) - max(lo, start)))
            start = end
            if start >= hi:
                break
        if not pieces:
            sch = self._schema if columns is None else pa.schema(
                [self._schema.field(c) for c in columns])
            return pa.table({f.name: pa.array([], f.type) for f in sch})
        return pa.concat_tables(pieces)

    def dataset_dictionaries(self, columns=None) -> dict:
        """Global sorted string dictionaries computed ONE PART FILE at a
        time (batch.compute_dictionaries semantics with bounded RAM)."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        names = [f.name for f in self._schema
                 if (pa.types.is_string(f.type)
                     or pa.types.is_large_string(f.type))
                 and (columns is None or f.name in columns)]
        uniq = {n: set() for n in names}
        if names:
            for f in self.files:
                t = pq.read_table(f, columns=names)
                for n in names:
                    uniq[n].update(
                        np.asarray(pc.unique(pc.drop_null(t.column(n))),
                                   dtype=object).tolist())
        return {n: np.sort(np.array(sorted(u), dtype=object)).astype(object)
                for n, u in uniq.items()}

    @property
    def arrow_table(self):
        """Full materialization escape hatch for non-out-of-core paths;
        at SF100 scales callers should be on range_table instead."""
        if self._materialized is None:
            import logging
            import pyarrow as pa
            import pyarrow.parquet as pq
            logging.getLogger("ballista_tpu.context").warning(
                "materializing full parquet dataset %s (%d rows) — the "
                "serial runtime would stream it", self.name, self._n)
            self._materialized = pa.concat_tables(
                pq.read_table(f) for f in self.files)
        return self._materialized

    @arrow_table.setter
    def arrow_table(self, value):  # base __init__ assigns None
        self._materialized = value


class SessionContext:
    """Local mode by default (one device, one partition); `distributed=True`
    routes every collect through the standalone cluster (scheduler control
    plane + mesh execution over all local devices) — the BallistaContext
    local vs standalone split."""

    def __init__(self, options: Optional[PhysicalOptions] = None,
                 distributed: bool = False, mesh=None,
                 capacity_mode: str = "bucket",
                 serial_partitions: Optional[int] = None):
        if capacity_mode not in ("exact", "bucket"):
            raise ValueError("capacity_mode must be 'exact' or 'bucket'")
        self.tables: Dict[str, TableProvider] = {}
        self.views: Dict[str, tuple] = {}   # name -> (SelectStmt, col_aliases)
        self.options = options or PhysicalOptions()
        self.capacity_mode = capacity_mode
        # out-of-core: run stage DAGs partition-by-partition on one device
        # with host-RAM shuffles (scheduler/serial.py)
        self.serial_partitions = serial_partitions
        self._stage_cache: Dict[int, object] = {}
        self._distributed = distributed
        self._mesh = mesh
        self._cluster = None
        # planning warnings accumulated per session (WarningCollector,
        # core/src/warning_collector.rs); surfaced in job status
        self.warnings: list = []
        self.config = None  # optional BallistaConfig (set_config)

    def set_config(self, config) -> None:
        """Apply a BallistaConfig to this session (plugin dir, capacity
        mode; the session-config kv shipped with jobs in the reference)."""
        from ..config import BALLISTA_PLUGIN_DIR
        self.config = config
        self.capacity_mode = config.capacity_mode()
        plugin_dir = config.get(BALLISTA_PLUGIN_DIR)
        if plugin_dir:
            self.load_plugins(plugin_dir)

    def evict_device(self) -> None:
        """Free HBM: drop every table's device columns (host ingest kept;
        re-uploads happen lazily on next use). Call between queries in
        memory-tight sweeps or after a RESOURCE_EXHAUSTED failure."""
        for tp in self.tables.values():
            tp.evict_device()
        self._stage_cache.clear()

    def cluster(self):
        """The standalone scheduler+mesh cluster (created lazily)."""
        if self._cluster is None:
            from ..scheduler.standalone import StandaloneCluster
            self._cluster = StandaloneCluster(self, self._mesh)
        return self._cluster

    # -- registration (BallistaContext::register_* parity) --
    def register_arrow(self, name: str, table, primary_key=None) -> None:
        self.tables[name] = TableProvider(
            name, table, primary_key, bucket=self.capacity_mode == "bucket")

    def register_pandas(self, name: str, df, primary_key=None) -> None:
        import pyarrow as pa
        self.register_arrow(name, pa.Table.from_pandas(df, preserve_index=False),
                            primary_key)

    def register_csv(self, name: str, path: str, schema=None,
                     primary_key=None, **kwargs) -> None:
        import pyarrow.csv as pacsv
        opts = {}
        if schema is not None:
            opts["convert_options"] = pacsv.ConvertOptions(column_types=schema)
        table = pacsv.read_csv(path, **opts)
        self.register_arrow(name, table, primary_key)

    def register_parquet(self, name: str, path: str, primary_key=None) -> None:
        import pyarrow.parquet as pq
        self.register_arrow(name, pq.read_table(path), primary_key)

    def register_parquet_dataset(self, name: str, directory: str,
                                 primary_key=None) -> None:
        """Out-of-core: a directory of parquet part files scanned
        range-by-range, never fully materialized (datagen --chunks layout;
        the SF100 scan plane)."""
        self.tables[name] = ParquetDatasetProvider(
            name, directory, primary_key,
            bucket=self.capacity_mode == "bucket")

    def register_json(self, name: str, path: str, primary_key=None) -> None:
        """Newline-delimited JSON (BallistaContext::read_json parity)."""
        import pyarrow.json as pajson
        self.register_arrow(name, pajson.read_json(path), primary_key)

    def register_avro(self, name: str, path: str, primary_key=None) -> None:
        """Avro registration (BallistaContext::read_avro parity). pyarrow
        has no Avro reader; avro.py implements the container format
        (null/deflate codecs, nullable unions, date/timestamp/decimal
        logical types)."""
        from ..avro import read_avro
        self.register_arrow(name, read_avro(path), primary_key)

    # read_* variants return a DataFrame over an anonymous registration
    # (BallistaContext::read_csv/parquet/json, context.rs:143+)
    def read_csv(self, path: str, schema=None, **kwargs) -> DataFrame:
        name = f"__read_{len(self.tables)}"
        self.register_csv(name, path, schema=schema, **kwargs)
        return self.table(name)

    def read_parquet(self, path: str) -> DataFrame:
        name = f"__read_{len(self.tables)}"
        self.register_parquet(name, path)
        return self.table(name)

    def read_json(self, path: str) -> DataFrame:
        name = f"__read_{len(self.tables)}"
        self.register_json(name, path)
        return self.table(name)

    def read_avro(self, path: str) -> DataFrame:
        name = f"__read_{len(self.tables)}"
        self.register_avro(name, path)
        return self.table(name)

    def register_udf(self, name: str, fn, out_dtype,
                     propagate_nulls: bool = True) -> None:
        """Register a scalar UDF usable from SQL / DataFrame expressions
        (BallistaContext UDF registry parity; fn is traced into the stage
        XLA program, so it must be jittable)."""
        from .. import exprs as E
        E.register_udf(name, fn, out_dtype, propagate_nulls)

    def load_plugins(self, plugin_dir: str):
        """Load UDF plugin modules from a directory (the dlopen plugin
        system, core/src/plugin; plugin.py for the module contract)."""
        from ..plugin import load_plugins
        return load_plugins(plugin_dir, self)

    def list_functions(self, kind=None):
        """All SQL functions, built-ins + registered UDFs
        (ballista-cli ListFunctions, command.rs:36)."""
        from ..functions import list_functions
        return list_functions(kind)

    # -- planning warnings (WarningCollector parity,
    #    core/src/warning_collector.rs) --
    def warn(self, message: str) -> None:
        self.warnings.append(message)

    def take_warnings(self):
        out, self.warnings = self.warnings, []
        return out

    def unique_keys(self, name: str):
        """Unique column sets for join build-side selection (declared PK,
        else inferred for small tables)."""
        tp = self.tables[name]
        if tp.primary_key:
            return [tp.primary_key]
        if tp._inferred_unique is None:
            import pyarrow.compute as pc
            uniq = []
            t = tp.arrow_table
            if t.num_rows <= 1_000_000:
                for field in t.schema:
                    col = t.column(field.name)
                    try:
                        if len(pc.unique(col)) == t.num_rows:
                            uniq.append((field.name,))
                    except Exception:
                        pass
            tp._inferred_unique = uniq
        return tp._inferred_unique

    # -- plan creation --
    def table(self, name: str) -> DataFrame:
        tp = self.tables[name]
        return DataFrame(self, L.TableScan(
            name, tp.schema,
            unique_cols=tuple(tuple(k) for k in self.unique_keys(name))))

    def _ensure_referenced_meta(self, query: str) -> None:
        """Lexical pre-pass for BIG tables (whose schema property skips
        the eager string-dictionary ensure): any column name appearing as
        a word in the query text gets its metadata ensured up front, so
        logical-plan-time expression binding finds the dictionaries it
        needs without paying for unreferenced columns."""
        import re
        words = set(re.findall(r"[a-zA-Z_][a-zA-Z0-9_]*", query.lower()))
        eager = int(os.environ.get("BALLISTA_EAGER_META_ROWS", "5000000"))
        for name, tp in self.tables.items():
            if tp.num_rows <= eager or name.lower() not in words:
                continue
            cols = [f.name for f in tp._field_list()
                    if f.name.lower() in words]
            if cols:
                tp.ensure_meta(cols)

    def sql(self, query: str) -> DataFrame:
        """Run a SQL script: SELECTs plus CREATE/DROP VIEW statements
        (the TPC-H Q15 shape; BallistaContext::sql similarly intercepts
        DDL, context.rs:362). Returns the last SELECT as a DataFrame."""
        self._ensure_referenced_meta(query)
        from ..sql.parser import (CreateExternalTable, CreateTableAs,
                                  CreateView, DropView, ExplainStmt,
                                  ShowColumns, ShowTables, parse_statements)
        from ..sql.planner import SqlPlanner

        last = None
        for stmt in parse_statements(query):
            if isinstance(stmt, CreateView):
                self.views[stmt.name] = (stmt.query, stmt.columns)
            elif isinstance(stmt, DropView):
                self.views.pop(stmt.name, None)
            elif isinstance(stmt, CreateExternalTable):
                self._create_external_table(stmt)
            elif isinstance(stmt, CreateTableAs):
                from ..sql.planner import SqlPlanner as _SP
                df = DataFrame(self, _SP(self).plan_select(stmt.query))
                self.register_arrow(stmt.name, df.to_arrow())
            elif isinstance(stmt, ExplainStmt):
                last = self._explain(stmt.query)
            elif isinstance(stmt, ShowTables):
                last = self._show_tables()
            elif isinstance(stmt, ShowColumns):
                last = self._show_columns(stmt.name)
            else:
                last = DataFrame(self, SqlPlanner(self).plan_select(stmt))
        if last is None:
            raise ValueError("no SELECT statement in script")
        return last

    # -- DDL / catalog statements intercepted like BallistaContext::sql --
    def _create_external_table(self, stmt):
        if stmt.fmt == "csv":
            import pyarrow.csv as pacsv
            from ..schema import to_arrow_type
            kwargs = {}
            if stmt.columns:
                kwargs["convert_options"] = pacsv.ConvertOptions(
                    column_types={n: to_arrow_type(t)
                                  for n, t in stmt.columns})
                if not stmt.header:
                    kwargs["read_options"] = pacsv.ReadOptions(
                        column_names=[n for n, _ in stmt.columns])
            self.register_arrow(stmt.name,
                                pacsv.read_csv(stmt.location, **kwargs))
        elif stmt.fmt == "parquet":
            self.register_parquet(stmt.name, stmt.location)
        elif stmt.fmt in ("json", "ndjson"):
            self.register_json(stmt.name, stmt.location)
        else:
            raise NotImplementedError(f"STORED AS {stmt.fmt}")

    def _catalog_df(self, name: str, table) -> "DataFrame":
        self.register_arrow(name, table)
        return self.table(name)

    def _explain(self, query_stmt) -> "DataFrame":
        """EXPLAIN <select>: one row per plan tier (DataFusion's
        (plan_type, plan) shape the reference inherits)."""
        import pyarrow as pa
        from ..planner.physical import create_physical_plan
        from ..sql.planner import SqlPlanner
        plan = SqlPlanner(self).plan_select(query_stmt)
        rows = [("logical_plan", plan.display())]
        try:
            capacities = {n: tp.capacity for n, tp in self.tables.items()}
            ep = create_physical_plan(plan, capacities, self.options)
            rows.append(("physical_plan", ep.display()))
        except Exception as e:  # noqa: BLE001 - logical tier still useful
            rows.append(("physical_plan", f"<not available: {e}>"))
        return self._catalog_df("__explain__", pa.table(
            {"plan_type": [r[0] for r in rows],
             "plan": [r[1] for r in rows]}))

    def _show_tables(self) -> "DataFrame":
        """SHOW TABLES (information_schema.tables shape, config.rs
        with_information_schema parity)."""
        import pyarrow as pa
        rows = [("ballista", "public", n, "BASE TABLE")
                for n in self.tables if not n.startswith("__")]
        rows += [("ballista", "public", n, "VIEW") for n in self.views]
        cols = list(zip(*rows)) or [[], [], [], []]
        return self._catalog_df("__show_tables__", pa.table(
            {"table_catalog": cols[0], "table_schema": cols[1],
             "table_name": cols[2], "table_type": cols[3]}))

    def _show_columns(self, name: str) -> "DataFrame":
        import pyarrow as pa
        tp = self.tables.get(name)
        if tp is None:
            raise KeyError(f"table {name!r} not found")
        sch = tp.schema
        return self._catalog_df("__show_columns__", pa.table(
            {"table_name": [name] * len(sch.fields),
             "column_name": [f.name for f in sch.fields],
             "data_type": [str(f.dtype) for f in sch.fields],
             "is_nullable": ["YES" if f.nullable else "NO"
                             for f in sch.fields]}))

    def bind_inputs(self, input_ids) -> dict:
        """Bind stage input ids to device batches. Column-scoped ids
        ("table::c1,c2", emitted for pruned scans) bind a column-sliced
        batch so unused table columns never transfer to or occupy HBM."""
        out = {}
        for i in set(input_ids):
            name, _, cols = i.partition("::")
            tp = self.tables[name]
            out[i] = (tp.column_batch(cols.split(",")) if cols
                      else tp.batch)
        return out

    # -- execution --
    def collect(self, plan: L.LogicalPlan, max_retries: int = 5):
        if self._distributed:
            cl = self.cluster()
            job_id = cl.submit_plan(plan)
            return cl.wait(job_id)
        if self.serial_partitions:
            from ..scheduler.serial import execute_serial
            return execute_serial(self, plan, self.serial_partitions,
                                  max_retries=max_retries)

        # automatic out-of-core routing: plans whose predicted peak HBM
        # is well beyond the device go straight to the serial runtime
        # (exec/memory.py; the reference gets this implicitly from its
        # disk-spilling volcano model). Borderline plans try in-core and
        # fall back on RESOURCE_EXHAUSTED.
        route_n = 0
        try:
            # cheap gate: when even a 200 B/row over-estimate of every
            # registered table fits the budget, no plan can plausibly
            # exceed HBM — skip the extra planning pass (keeps small
            # interactive queries free of routing overhead)
            from ..exec.memory import hbm_budget_bytes
            total_rows = sum(tp.num_rows for tp in self.tables.values())
            if total_rows * 200 >= hbm_budget_bytes():
                from ..exec.memory import route_serial
                from ..planner.optimizer import prune_columns
                pruned = _rebind_scans(prune_columns(plan), self)
                capacities = {n: tp.capacity
                              for n, tp in self.tables.items()}
                route_n = route_serial(create_physical_plan(
                    pruned, capacities, self.options))
        except Exception:  # noqa: BLE001 - estimator must not block a query
            route_n = 0
        if route_n:
            self.warn(f"plan routed out-of-core (serial@{route_n}): "
                      "predicted working set exceeds device memory")
            from ..scheduler.serial import execute_serial
            return execute_serial(self, pruned, route_n,
                                  max_retries=max_retries)
        try:
            fn, inputs, exec_plan, out = self.converge_compile(
                plan, max_retries=max_retries)
            return out, exec_plan.schema
        except Exception as e:  # noqa: BLE001
            if "RESOURCE_EXHAUSTED" not in str(e) and \
                    "exceed memory" not in str(e):
                raise
            import gc

            import jax as _jax
            fn = inputs = exec_plan = out = None
            self.evict_device()
            _jax.clear_caches()
            gc.collect()
            self.warn("in-core execution exhausted device memory; "
                      "falling back to the out-of-core serial runtime")
            from ..exec.memory import (estimate_plan_hbm, hbm_budget_bytes,
                                       oom_memo_record, plan_fingerprint,
                                       plan_serial_partitions)
            from ..planner.optimizer import prune_columns
            pruned = _rebind_scans(prune_columns(plan), self)
            try:
                capacities = {n: tp.capacity
                              for n, tp in self.tables.items()}
                ep2 = create_physical_plan(pruned, capacities, self.options)
                n_parts = plan_serial_partitions(
                    estimate_plan_hbm(ep2), hbm_budget_bytes())
                # the OOM just proved the estimate low: double the model's
                # partition count (see runner.py fallback)
                n_parts = min(n_parts * 2, 64)
                # learned routing: future sessions with this plan shape
                # skip the doomed in-core compile
                oom_memo_record(plan_fingerprint(ep2), n_parts)
            except Exception:  # noqa: BLE001
                n_parts = 4
            from ..scheduler.serial import execute_serial
            return execute_serial(self, pruned, n_parts,
                                  max_retries=max_retries)

    def converge_compile(self, plan: L.LogicalPlan, max_retries: int = 5,
                         pruned: bool = False):
        """Compile with overflow detection and retry until the output fits.

        Returns (fn, inputs, exec_plan, out) where `out` is the first
        non-overflowing result and `fn(inputs)` -> (batch, overflow_flag)
        can be re-dispatched (benchmark timing loops). Every capacity-
        bound program MUST go through this (or the distributed runtime's
        equivalent): compiling without the overflow flag silently clips
        expanding joins — found the hard way as a q21 SF1 mismatch."""
        import dataclasses as dc

        capacities = {name: tp.capacity for name, tp in self.tables.items()}
        if not pruned:
            # prune FIRST so the rebind ensures (and ingests) only the
            # scanned columns, then refresh scan schemas with ingest-time
            # dictionaries
            from ..planner.optimizer import prune_columns
            plan = prune_columns(plan)
            plan = _rebind_scans(plan, self)
        opts = self.options
        for attempt in range(max_retries):
            exec_plan = create_physical_plan(plan, capacities, opts)
            fn, input_ids = compile_stage(exec_plan, with_overflow=True)
            if hasattr(fn, "prewarm"):
                # overlap piece compilation with host ingest: shapes are
                # fully static, so the AOT pool starts from shape specs
                # while bind_inputs is still reading/encoding columns
                import threading

                from ..exec.plan import input_shape_specs
                threading.Thread(target=fn.prewarm,
                                 args=(input_shape_specs(exec_plan),),
                                 daemon=True).start()
            inputs = self.bind_inputs(input_ids)
            out, overflow = fn(inputs)
            if not bool(overflow):
                return fn, inputs, exec_plan, out
            if attempt == max_retries - 1:
                # returning the clipped batch would be a silently wrong
                # answer (found by fuzzing: heavy-expansion joins)
                raise RuntimeError(
                    "join/group output overflowed capacity after "
                    f"{max_retries} retries (last join_out_factor "
                    f"{opts.join_out_factor}); raise max_retries or "
                    "PhysicalOptions.join_out_factor")
            # capacity-with-overflow-retry (expanding-join output or group
            # table too small)
            self.warn(f"stage output overflowed capacity on attempt "
                      f"{attempt + 1}; retrying with 4x join/group capacity")
            opts = dc.replace(opts, join_out_factor=opts.join_out_factor * 4,
                              max_group_table=opts.max_group_table * 4)


def file_metadata(path: str) -> dict:
    """Schema + row count of a parquet/csv/json file without a full read
    (GetFileMetadata RPC parity, scheduler grpc.rs:293 — the reference
    infers parquet schemas server-side for clients)."""
    import os
    ext = os.path.splitext(path)[1].lower()
    if ext == ".parquet":
        import pyarrow.parquet as pq
        f = pq.ParquetFile(path)
        schema = f.schema_arrow
        meta = {"num_rows": f.metadata.num_rows,
                "num_row_groups": f.metadata.num_row_groups}
    elif ext == ".csv":
        import pyarrow.csv as pacsv
        t = pacsv.read_csv(path)  # no cheap schema-only CSV read in pyarrow
        schema, meta = t.schema, {"num_rows": t.num_rows}
    elif ext in (".json", ".ndjson"):
        import pyarrow.json as pajson
        t = pajson.read_json(path)
        schema, meta = t.schema, {"num_rows": t.num_rows}
    else:
        raise ValueError(f"unsupported file type: {path!r}")
    return {"path": path,
            "fields": [{"name": f.name, "type": str(f.type),
                        "nullable": f.nullable} for f in schema],
            **meta}


def _rebind_scans(plan: L.LogicalPlan, ctx: SessionContext) -> L.LogicalPlan:
    import dataclasses as dc
    if isinstance(plan, L.TableScan):
        tp = ctx.tables[plan.table_name]
        # binding needs ingest-time metadata (dictionaries/bounds) for the
        # scanned columns only — prune before rebinding so a 4-column scan
        # of a 16-column table ingests 4 columns
        tp.ensure_meta(plan.projection
                       or [f.name for f in tp._field_list()])
        return dc.replace(plan, table_schema=tp.schema)
    kids = plan.children()
    if not kids:
        return plan
    new = {f.name: getattr(plan, f.name) for f in dc.fields(plan)}
    for key, val in list(new.items()):
        if isinstance(val, L.LogicalPlan):
            new[key] = _rebind_scans(val, ctx)
        elif isinstance(val, (list, tuple)) and \
                any(isinstance(v, L.LogicalPlan) for v in val):
            # list-valued children (Union.inputs)
            new[key] = type(val)(_rebind_scans(v, ctx)
                                 if isinstance(v, L.LogicalPlan) else v
                                 for v in val)
    return type(plan)(**new)
