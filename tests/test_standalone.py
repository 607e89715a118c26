"""Standalone cluster: jobs flow through the real scheduler control plane
into mesh execution (the reference's two-process integration test analog,
SURVEY.md §4.5 — here single-controller on the virtual 8-device mesh)."""

import numpy as np
import pandas as pd
import pytest

import jax

from ballista_tpu.benchmarks import TPCH_QUERIES
from ballista_tpu.client import SessionContext
from ballista_tpu.datagen import generate_tpch, register_tpch
from ballista_tpu.parallel.mesh import make_mesh
from ballista_tpu.scheduler.distributed_planner import DistOptions
from ballista_tpu.scheduler.standalone import StandaloneCluster

from tpch_oracle import ORACLES, to_pd

SF = 0.002


@pytest.fixture(scope="module")
def cluster():
    data = generate_tpch(SF)
    ctx = SessionContext()
    register_tpch(ctx, SF, data=data)
    mesh = make_mesh(8)
    return (StandaloneCluster(ctx, mesh, DistOptions(n_partitions=8)),
            to_pd(data))


def test_job_lifecycle_and_result(cluster):
    cl, pdt = cluster
    job_id = cl.submit_sql(TPCH_QUERIES[1])
    status = cl.job_status(job_id)
    assert status["state"] in ("running", "successful", "queued")
    df = None
    batch, schema = cl.wait(job_id)
    from ballista_tpu import batch as B
    df = B.to_pandas(batch, schema)
    exp = ORACLES[1](pdt)
    assert len(df) == len(exp)
    np.testing.assert_allclose(df["sum_qty"].astype(float),
                               exp["sum_qty"].astype(float))
    final = cl.job_status(job_id)
    assert final["state"] == "successful"
    assert all(s["state"] == "successful" for s in final["stages"].values())


def test_multi_job_and_join_query(cluster):
    cl, pdt = cluster
    j1 = cl.submit_sql(TPCH_QUERIES[6])
    j2 = cl.submit_sql(TPCH_QUERIES[5])
    cl.scheduler.run_until_idle()
    assert cl.job_status(j1)["state"] == "successful"
    assert cl.job_status(j2)["state"] == "successful"
    df5 = cl.sql(TPCH_QUERIES[5])
    exp5 = ORACLES[5](pdt)
    assert list(df5["n_name"]) == list(exp5["n_name"])


def test_failed_stage_retries_then_succeeds(cluster):
    cl, pdt = cluster
    # sabotage the first stage execution once; the scheduler's task retry
    # must re-launch it and the job must still succeed
    from ballista_tpu.scheduler import standalone as S

    orig = S.JobContext.run_stage
    calls = {"n": 0}

    def flaky(self, stage_id, max_quota_retries=3):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected transient failure")
        return orig(self, stage_id, max_quota_retries)

    S.JobContext.run_stage = flaky
    try:
        df = cl.sql("select count(*) as n from lineitem")
        assert int(df["n"][0]) > 0
    finally:
        S.JobContext.run_stage = orig
    assert calls["n"] >= 2


def test_session_context_distributed_mode():
    data = generate_tpch(SF)
    ctx = SessionContext(distributed=True, mesh=make_mesh(8))
    register_tpch(ctx, SF, data=data)
    pdt = to_pd(data)
    # includes an eager scalar subquery (q11) -> nested distributed jobs
    df = ctx.sql(TPCH_QUERIES[11]).to_pandas()
    exp = ORACLES[11](pdt)
    assert len(df) == len(exp)
    np.testing.assert_allclose(df["value"].astype(float),
                               exp["value"].astype(float), rtol=1e-6)


def test_operator_metrics_collected(cluster):
    cl, pdt = cluster
    jid = cl.submit_sql(
        "select l_returnflag, count(*) as c from lineitem "
        "where l_quantity < 10 group by l_returnflag")
    cl.scheduler.run_until_idle()
    jc = cl.launcher.jobs[jid]
    all_ops = {}
    for sid, ops in jc.op_metrics.items():
        all_ops.update(ops)
    assert any("HashAggregateExec" in k for k in all_ops), all_ops
    # group counts are small; aggregate output rows must be tiny
    agg_rows = [v for k, v in all_ops.items() if "HashAggregateExec" in k]
    assert all(v <= 32 for v in agg_rows)


def test_circuit_breaker_trips_on_global_limit(cluster):
    """Data-plane row accounting (CircuitBreakerClient analog): a LIMIT
    query's stage reports percent-consumed; the scheduler controller trips
    once the global limit is satisfied — and results stay correct."""
    cl, pdt = cluster
    df = cl.sql("select l_orderkey from lineitem limit 5")
    assert len(df) == 5
    jid = [j for j in cl.launcher.jobs][-1]
    assert cl.scheduler.circuit_breaker.is_tripped(jid, "global-limit")

def test_pull_mode_cluster_end_to_end(cluster):
    """Pull-staged standalone: same query flows via PollWork instead of
    pushed LaunchTask (execution_loop.rs:56 integration analog)."""
    cl, pdt = cluster
    pull = StandaloneCluster(cl.ctx, cl.runtime.mesh,
                             DistOptions(n_partitions=8), policy="pull")
    df = pull.sql(TPCH_QUERIES[6])
    exp = ORACLES[6](pdt)
    np.testing.assert_allclose(df["revenue"].astype(float),
                               exp["revenue"].astype(float))
    assert pull.scheduler.policy == "pull"
