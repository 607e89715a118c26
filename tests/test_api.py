"""REST API (reference /api/* route parity) over a standalone cluster."""

import json
import urllib.request

import pytest

from ballista_tpu.api import ApiServer
from ballista_tpu.benchmarks import TPCH_QUERIES
from ballista_tpu.client import SessionContext
from ballista_tpu.datagen import register_tpch
from ballista_tpu.parallel.mesh import make_mesh
from ballista_tpu.scheduler.distributed_planner import DistOptions
from ballista_tpu.scheduler.standalone import StandaloneCluster


@pytest.fixture(scope="module")
def api():
    ctx = SessionContext()
    register_tpch(ctx, 0.002)
    cl = StandaloneCluster(ctx, make_mesh(8), DistOptions(n_partitions=8))
    server = ApiServer(cl).start()
    yield server, cl
    server.stop()


def get(server, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{server.port}{path}") as r:
        body = r.read().decode()
        return r.status, body


def test_state_jobs_metrics_dot(api):
    server, cl = api
    job_id = cl.submit_sql(TPCH_QUERIES[1])
    cl.scheduler.run_until_idle()

    code, body = get(server, "/api/state")
    state = json.loads(body)
    assert code == 200 and state["executors"][0]["id"] == "mesh-executor-0"

    code, body = get(server, "/api/jobs")
    jobs = json.loads(body)
    assert any(j["job_id"] == job_id for j in jobs)

    code, body = get(server, f"/api/job/{job_id}")
    assert json.loads(body)["state"] == "successful"

    code, body = get(server, f"/api/job/{job_id}/dot")
    assert code == 200 and body.startswith("digraph")

    code, body = get(server, "/api/metrics")
    m = json.loads(body)
    assert m["jobs_successful"] >= 1 and not m["active"]

    code, body = get(server, "/api/job/nope123")
    assert json.loads(body)["state"] == "not_found"


def test_executors_stages_scaler_routes(api):
    server, cl = api
    job_id = cl.submit_sql(TPCH_QUERIES[1])
    cl.scheduler.run_until_idle()

    code, body = get(server, "/api/executors")
    ex = json.loads(body)
    assert code == 200 and ex[0]["task_slots"] >= 1 and "last_seen_s" in ex[0]

    code, body = get(server, f"/api/job/{job_id}/stages")
    stages = json.loads(body)["stages"]
    assert code == 200 and stages
    assert all(s["state"] == "successful" for s in stages)
    # operator-row metrics ride the stage programs (commit: scalar outputs)
    assert any(s["metrics"]["operator_rows"] for s in stages)

    sid = stages[0]["stage_id"]
    code, body = get(server, f"/api/job/{job_id}/stage/{sid}/dot")
    assert code == 200 and body.startswith(f"digraph stage_{sid}")

    code, body = get(server, "/api/scaler/is_active")
    assert code == 200 and json.loads(body)["result"] is False
    code, body = get(server, "/api/scaler/metrics")
    assert json.loads(body)["metricName"] == "pending_tasks"

    # dot_svg renders when graphviz is present, 501s cleanly otherwise
    import shutil
    import urllib.error
    try:
        code, body = get(server, f"/api/job/{job_id}/dot_svg")
        assert shutil.which("dot") and "<svg" in body
    except urllib.error.HTTPError as e:
        assert e.code == 501


def test_cancel_job(api):
    server, cl = api
    job_id = cl.submit_sql(TPCH_QUERIES[6])
    import urllib.request
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/api/job/{job_id}", method="PATCH")
    with urllib.request.urlopen(req) as r:
        assert json.loads(r.read())["cancelled"]


def test_dashboard_and_udf(api):
    server, cl = api
    code, body = get(server, "/")
    assert code == 200 and "ballista_tpu scheduler" in body

    # UDF registry (plugin-system parity): usable straight from SQL
    import jax.numpy as jnp
    from ballista_tpu.schema import INT64
    cl.ctx.register_udf("double_it", lambda x: x * 2, INT64)
    df = cl.ctx.sql(
        "select double_it(n_nationkey) as d from nation order by d desc limit 2"
    ).to_pandas()
    assert list(df["d"]) == [48, 46]


def test_read_json_and_csv(tmp_path):
    import json as _json
    from ballista_tpu.client import SessionContext

    jpath = tmp_path / "t.jsonl"
    jpath.write_text("\n".join(_json.dumps({"a": i, "b": f"s{i}"})
                               for i in range(5)))
    cpath = tmp_path / "t.csv"
    cpath.write_text("a,b\n1,x\n2,y\n")
    ctx = SessionContext()
    df = ctx.read_json(str(jpath))
    out = df.to_pandas()
    assert list(out["a"]) == [0, 1, 2, 3, 4]
    df2 = ctx.read_csv(str(cpath))
    assert list(df2.to_pandas()["b"]) == ["x", "y"]


def test_register_avro_missing_file():
    import pytest
    from ballista_tpu.client import SessionContext
    with pytest.raises(FileNotFoundError):
        SessionContext().register_avro("x", "nope.avro")
