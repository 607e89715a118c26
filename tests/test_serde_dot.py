from ballista_tpu.benchmarks import TPCH_QUERIES
from ballista_tpu.client import SessionContext
from ballista_tpu.datagen import register_tpch
from ballista_tpu.serde.plans import plan_from_json, plan_to_json
from ballista_tpu.utils import distributed_plan_dot, logical_plan_dot
from ballista_tpu.scheduler import DistributedPlanner
from ballista_tpu.scheduler.distributed_planner import DistOptions
from ballista_tpu import batch as B

import pytest


@pytest.fixture(scope="module")
def ctx():
    c = SessionContext()
    register_tpch(c, 0.002)
    return c


@pytest.mark.parametrize("query", [1, 3, 5, 8, 12, 19])
def test_plan_json_roundtrip_executes(ctx, query):
    plan = ctx.sql(TPCH_QUERIES[query]).plan
    js = plan_to_json(plan)
    plan2 = plan_from_json(js)
    # round-tripped plan must produce identical results
    b1, s1 = ctx.collect(plan)
    b2, s2 = ctx.collect(plan2)
    df1 = B.to_pandas(b1, s1)
    df2 = B.to_pandas(b2, s2)
    assert df1.equals(df2), f"q{query} roundtrip mismatch"


def test_dot_outputs(ctx):
    plan = ctx.sql(TPCH_QUERIES[3]).plan
    dot = logical_plan_dot(plan)
    assert dot.startswith("digraph") and "Aggregate" in dot
    dp = DistributedPlanner(ctx, DistOptions(n_partitions=8)).plan(plan)
    ddot = distributed_plan_dot(dp)
    assert "cluster_0" in ddot and "shuffle" in ddot
    assert ddot.count("subgraph") == len(dp.stages)


def test_wire_version_guard():
    """Persisted state from another wire version is rejected up front
    (cross-version decode guard for recover_jobs + sqlite job store)."""
    import json

    import pytest

    from ballista_tpu.serde.plans import (WIRE_VERSION, WireVersionError,
                                          plan_from_json, plan_to_json)
    from ballista_tpu.planner import logical as L
    from ballista_tpu.schema import DataType, Field, Schema, TypeKind

    schema = Schema([Field("x", DataType(TypeKind.INT64))])
    plan = L.TableScan("t", schema, None)
    s = plan_to_json(plan)
    assert json.loads(s)["@wire"] == WIRE_VERSION
    assert isinstance(plan_from_json(s), L.TableScan)
    doc = json.loads(s)
    doc["@wire"] = WIRE_VERSION + 1
    with pytest.raises(WireVersionError):
        plan_from_json(json.dumps(doc))


def test_job_store_version_guard(tmp_path):
    import json

    import pytest

    from ballista_tpu.scheduler.job_store import FileJobStore, recover_graphs
    from ballista_tpu.serde.plans import WireVersionError

    store = FileJobStore(str(tmp_path))
    # fabricate a stale-version persisted job
    with open(tmp_path / "zzz9999.json", "w") as f:
        json.dump({"@wire": 999, "graph": {}}, f)
    with pytest.raises(WireVersionError):
        recover_graphs(store)
