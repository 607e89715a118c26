"""Parity extras: function registry, plugins, file metadata, scheduler
metrics, executor load averages, planning warnings (SURVEY.md §2 items:
ballista-cli commands, core/src/plugin, grpc.rs GetFileMetadata,
metrics/prometheus.rs, executor metrics/load.rs, warning_collector.rs)."""

import os
import textwrap
import time

import pyarrow as pa
import pytest

from ballista_tpu.client import SessionContext
from ballista_tpu.scheduler.execution_graph import ExecutionGraph, TaskStatus
from ballista_tpu.scheduler.server import (ExecutorMetadata, SchedulerServer,
                                           TaskLauncher)


class InstantLauncher(TaskLauncher):
    def launch(self, tasks, report):
        report([TaskStatus(t.task_id, t.job_id, t.stage_id, t.partitions,
                           t.executor_id, "successful") for t in tasks])


def _run_job(sched, job_id="jobm"):
    g = ExecutionGraph(job_id, [(0, 2, []), (1, 1, [0])])
    sched.submit_job(g)
    sched.run_until_idle()
    return g


class TestFunctions:
    def test_list_and_search(self):
        from ballista_tpu.functions import list_functions, search_functions
        names = {f.name for f in list_functions()}
        assert {"sum", "avg", "row_number", "coalesce"} <= names
        hits = search_functions("rank")
        assert {"rank", "dense_rank", "percent_rank"} <= {f.name for f in hits}
        assert all(f.kind == "aggregate"
                   for f in list_functions(kind="aggregate"))

    def test_udfs_listed(self):
        from ballista_tpu import schema as S
        from ballista_tpu.functions import list_functions
        ctx = SessionContext()
        ctx.register_udf("my_double", lambda x: x * 2, S.INT64)
        assert "my_double" in {f.name for f in list_functions(kind="udf")}


class TestPlugins:
    def test_load_plugin_dir(self, tmp_path):
        (tmp_path / "doubler.py").write_text(textwrap.dedent("""
            BALLISTA_PLUGIN_API = 1
            def register(ctx):
                from ballista_tpu import schema as S
                ctx.register_udf("plugin_double", lambda x: x * 2, S.INT64)
        """))
        ctx = SessionContext()
        loaded = ctx.load_plugins(str(tmp_path))
        assert loaded == ["doubler"]
        ctx.register_arrow("t", pa.table({"x": [1, 2, 3]}))
        df = ctx.sql("select plugin_double(x) as y from t order by y")
        assert df.to_pandas()["y"].tolist() == [2, 4, 6]

    def test_version_gate(self, tmp_path):
        from ballista_tpu.plugin import PluginError
        (tmp_path / "old.py").write_text(
            "BALLISTA_PLUGIN_API = 0\ndef register(ctx): pass\n")
        with pytest.raises(PluginError, match="API"):
            SessionContext().load_plugins(str(tmp_path))

    def test_config_plugin_dir(self, tmp_path):
        from ballista_tpu.config import BALLISTA_PLUGIN_DIR, BallistaConfig
        (tmp_path / "p.py").write_text(textwrap.dedent("""
            BALLISTA_PLUGIN_API = 1
            def register(ctx):
                from ballista_tpu import schema as S
                ctx.register_udf("cfg_fn", lambda x: x + 1, S.INT64)
        """))
        ctx = SessionContext()
        ctx.set_config(BallistaConfig().set(BALLISTA_PLUGIN_DIR,
                                            str(tmp_path)))
        from ballista_tpu import exprs
        assert "cfg_fn" in exprs._UDF_REGISTRY


class TestFileMetadata:
    def test_parquet(self, tmp_path):
        import pyarrow.parquet as pq
        from ballista_tpu.client.context import file_metadata
        path = str(tmp_path / "t.parquet")
        pq.write_table(pa.table({"a": [1, 2], "b": ["x", "y"]}), path)
        meta = file_metadata(path)
        assert meta["num_rows"] == 2
        assert [f["name"] for f in meta["fields"]] == ["a", "b"]

    def test_csv(self, tmp_path):
        from ballista_tpu.client.context import file_metadata
        path = str(tmp_path / "t.csv")
        with open(path, "w") as fh:
            fh.write("a,b\n1,x\n2,y\n3,z\n")
        meta = file_metadata(path)
        assert meta["num_rows"] == 3

    def test_unsupported(self):
        from ballista_tpu.client.context import file_metadata
        with pytest.raises(ValueError):
            file_metadata("whatever.xlsx")


class TestSchedulerMetrics:
    def test_job_lifecycle_histograms(self):
        sched = SchedulerServer(InstantLauncher())
        sched.register_executor(ExecutorMetadata("e1", task_slots=4))
        _run_job(sched)
        m = sched.metrics.as_dict()
        assert m["job_submitted_latency"]["count"] == 1
        assert m["job_completed_latency"]["count"] == 1
        assert m["jobs_failed"] == 0
        assert m["event_processing"]  # per-event timings recorded

    def test_prometheus_text(self):
        sched = SchedulerServer(InstantLauncher())
        sched.register_executor(ExecutorMetadata("e1", task_slots=4))
        _run_job(sched)
        text = sched.metrics.prometheus_text(pending_tasks=0)
        assert "scheduler_job_completed_latency_seconds_count 1" in text
        assert "scheduler_pending_tasks 0" in text
        assert "scheduler_jobs_failed_total 0" in text


class TestLoadAverages:
    def test_load_tracks_used_slots(self):
        sched = SchedulerServer(InstantLauncher())
        sched.register_executor(ExecutorMetadata("e1", task_slots=4))
        ex = sched.executor_manager.executors["e1"]
        # hold 3 slots, age the sample, then heartbeat to decay toward 3
        sched.executor_manager.reserve_slots(3)
        ex._load_t -= 120  # pretend 2 minutes passed at load 3
        ex.sample_load()
        one, five, fifteen = ex.load_avg
        assert one > 2.0            # 1-min average converged near 3
        assert one > five > fifteen  # longer windows lag behind
        sched.executor_manager.cancel_reservations(["e1", "e1", "e1"])
        ex._load_t -= 600
        ex.sample_load()
        assert ex.load_avg[0] < 0.1  # decays back toward 0


class TestWarnings:
    def test_warning_in_job_status(self):
        ctx = SessionContext(distributed=True)
        ctx.register_arrow("t", pa.table({"x": list(range(16))}))
        ctx.warn("synthetic planning warning")
        cl = ctx.cluster()
        job_id = cl.submit_plan(ctx.sql("select sum(x) as s from t").plan)
        cl.wait(job_id)
        status = cl.job_status(job_id)
        assert status["warnings"] == ["synthetic planning warning"]
        assert ctx.warnings == []  # taken by the job


class TestApiRoutes:
    def test_metrics_and_file_metadata_routes(self, tmp_path):
        import json
        import urllib.request
        import pyarrow.parquet as pq
        from ballista_tpu.api import ApiServer

        ctx = SessionContext(distributed=True)
        ctx.register_arrow("t", pa.table({"x": list(range(16))}))
        cl = ctx.cluster()
        cl.sql("select sum(x) as s from t")
        api = ApiServer(cl).start()
        try:
            base = f"http://127.0.0.1:{api.port}"
            prom = urllib.request.urlopen(f"{base}/metrics").read().decode()
            assert "scheduler_job_completed_latency_seconds" in prom
            execs = json.loads(
                urllib.request.urlopen(f"{base}/api/executors").read())
            assert "load_avg" in execs[0]
            path = str(tmp_path / "f.parquet")
            pq.write_table(pa.table({"a": [1]}), path)
            meta = json.loads(urllib.request.urlopen(
                f"{base}/api/file_metadata?path={path}").read())
            assert meta["num_rows"] == 1
        finally:
            api.stop()


def test_information_schema_tables_and_columns():
    import pyarrow as pa
    from ballista_tpu.client import SessionContext

    ctx = SessionContext()
    ctx.register_arrow("t", pa.table({"x": [1, 2], "s": ["a", None]}))
    df = ctx.sql("select table_name, table_type from "
                 "information_schema.tables where table_name = 't'"
                 ).to_pandas()
    assert df["table_name"].tolist() == ["t"]
    cols = ctx.sql("select column_name, data_type from "
                   "information_schema.columns where table_name = 't' "
                   "order by column_name").to_pandas()
    assert cols["column_name"].tolist() == ["s", "x"]
    assert cols["data_type"].tolist() == ["string", "int64"]
