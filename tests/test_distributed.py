"""Distributed execution on the virtual 8-device CPU mesh: results must be
row-identical to the single-partition local path (and to the oracle)."""

import numpy as np
import pandas as pd
import pytest

import jax

from ballista_tpu import batch as B
from ballista_tpu.benchmarks import TPCH_QUERIES
from ballista_tpu.client import SessionContext
from ballista_tpu.datagen import generate_tpch, register_tpch
from ballista_tpu.parallel.mesh import make_mesh
from ballista_tpu.scheduler import DistributedPlanner
from ballista_tpu.scheduler.distributed_planner import DistOptions
from ballista_tpu.scheduler.runtime import execute_distributed

from tpch_oracle import ORACLES, to_pd

SF = 0.002


@pytest.fixture(scope="module")
def env():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    data = generate_tpch(SF)
    ctx = SessionContext()
    register_tpch(ctx, SF, data=data)
    mesh = make_mesh(8)
    return ctx, to_pd(data), mesh


def run_distributed(ctx, mesh, sql):
    plan = ctx.sql(sql).plan
    batch, schema = execute_distributed(ctx, plan, mesh,
                                        DistOptions(n_partitions=8))
    return B.to_pandas(batch, schema)


def assert_frames_match(got, exp, label):
    assert list(got.columns) == list(exp.columns), label
    assert len(got) == len(exp), f"{label}: {len(got)} vs {len(exp)} rows"
    for col in exp.columns:
        g, e = got[col], exp[col]
        if pd.api.types.is_float_dtype(e) or pd.api.types.is_float_dtype(g):
            np.testing.assert_allclose(g.astype(float).to_numpy(),
                                       e.astype(float).to_numpy(),
                                       rtol=1e-6, atol=1e-4, err_msg=f"{label} {col}")
        elif pd.api.types.is_datetime64_any_dtype(e):
            assert list(pd.to_datetime(g)) == list(e), f"{label} {col}"
        else:
            assert list(g) == list(e), f"{label} {col}"


def test_stage_decomposition_q1(env):
    """Planner parity test (planner.rs:336-520 analog): Q1 = scan+filter+
    partial agg | shuffle | final agg+sort -> 3 stages incl. merge."""
    ctx, _, mesh = env
    plan = ctx.sql(TPCH_QUERIES[1]).plan
    dplan = DistributedPlanner(ctx, DistOptions(n_partitions=8)).plan(plan)
    labels = [s.root._label() for s in dplan.stages]
    assert len(dplan.stages) == 3, dplan.display()
    assert "ExchangeExec" in labels[0]
    assert "GatherExec" in labels[1]  # local sort -> gather
    assert "PartitionPruneExec" in labels[2]  # final merge sort


@pytest.mark.parametrize("query", sorted(ORACLES))
def test_distributed_matches_oracle(env, query):
    ctx, pdt, mesh = env
    got = run_distributed(ctx, mesh, TPCH_QUERIES[query])
    exp = ORACLES[query](pdt)
    assert_frames_match(got, exp, f"q{query} distributed")


def test_distributed_full_outer_join(env):
    """FULL OUTER over the shuffle path: unmatched build rows must appear
    exactly once across partitions (broadcast is disallowed for full)."""
    ctx, pdata, mesh = env
    sql = """
        select c_custkey, c_name, o_orderkey, o_totalprice
        from customer full outer join orders on c_custkey = o_custkey
        order by c_custkey, o_orderkey
    """
    got = run_distributed(ctx, mesh, sql)
    c, o = pdata["customer"], pdata["orders"]
    exp = c.merge(o, left_on="c_custkey", right_on="o_custkey", how="outer")
    exp = exp[["c_custkey", "c_name", "o_orderkey", "o_totalprice"]]
    exp = exp.sort_values(["c_custkey", "o_orderkey"],
                          na_position="last").reset_index(drop=True)
    got = got.sort_values(["c_custkey", "o_orderkey"],
                          na_position="last").reset_index(drop=True)
    assert len(got) == len(exp)
    np.testing.assert_array_equal(
        got["c_custkey"].fillna(-1).astype(int).to_numpy(),
        exp["c_custkey"].fillna(-1).astype(int).to_numpy())
    np.testing.assert_array_equal(
        got["o_orderkey"].fillna(-1).astype(int).to_numpy(),
        exp["o_orderkey"].fillna(-1).astype(int).to_numpy())
    np.testing.assert_allclose(
        got["o_totalprice"].astype(float).to_numpy(),
        exp["o_totalprice"].astype(float).to_numpy(), rtol=1e-6)


def test_distributed_window(env):
    """Windows distribute by shuffling on PARTITION BY keys — capability the
    reference lacks (its planner rejects WindowAggExec, planner.rs:155)."""
    ctx, pdata, mesh = env
    sql = """
        select o_custkey, o_orderkey,
               row_number() over (partition by o_custkey
                                  order by o_orderdate, o_orderkey) as rn,
               sum(o_totalprice) over (partition by o_custkey) as spend
        from orders order by o_custkey, rn
    """
    got = run_distributed(ctx, mesh, sql)
    o = pdata["orders"].sort_values(["o_custkey", "o_orderdate",
                                     "o_orderkey"])
    exp = o.assign(
        rn=o.groupby("o_custkey").cumcount() + 1,
        spend=o.groupby("o_custkey")["o_totalprice"].transform("sum"),
    )[["o_custkey", "o_orderkey", "rn", "spend"]].reset_index(drop=True)
    got = got.reset_index(drop=True)
    assert len(got) == len(exp)
    np.testing.assert_array_equal(got["o_orderkey"].to_numpy(),
                                  exp["o_orderkey"].to_numpy())
    np.testing.assert_array_equal(got["rn"].to_numpy(), exp["rn"].to_numpy())
    np.testing.assert_allclose(got["spend"].astype(float).to_numpy(),
                               exp["spend"].astype(float).to_numpy(),
                               rtol=1e-6)


def test_distributed_cross_join(env):
    """CROSS JOIN distributes as broadcast build x sharded probe."""
    ctx, pdata, mesh = env
    got = run_distributed(ctx, mesh, """
        select count(*) c from region cross join nation
    """)
    exp = len(pdata["region"]) * len(pdata["nation"])
    assert int(got["c"][0]) == exp


def test_distributed_except_all():
    """Bag-semantics set ops through the mesh runtime (window
    row_number + per-key counts shuffle on the null-safe keys)."""
    from collections import Counter
    import pandas as pd
    import pyarrow as pa
    ctx = SessionContext()
    ctx.register_arrow("xa", pa.table({"x": [1, 1, 1, 2, 2, 3, None, None]}))
    ctx.register_arrow("xb", pa.table({"x": [1, 1, 2, 4, None]}))
    mesh = make_mesh(4)
    plan = ctx.sql("select x from xa except all select x from xb").plan
    batch, schema = execute_distributed(ctx, plan, mesh,
                                        DistOptions(n_partitions=4))
    df = B.to_pandas(batch, schema)
    got = Counter(None if pd.isna(v) else int(v) for v in df.x)
    assert got == Counter({1: 1, 2: 1, 3: 1, None: 1})


def test_agg_exchange_sized_by_group_bound(env):
    """The partial-aggregate state exchange must be sized by the
    aggregate's refined output bound, not the raw group-table size:
    q12's 7-value shipmode key once got a 1M-slot exchange (a 2M-row
    receive buffer for a 4-row result) — the most expensive stage of
    the whole query and a per-device-count scaling sink."""
    from ballista_tpu.client.context import _rebind_scans
    from ballista_tpu.planner.optimizer import prune_columns

    ctx, _, mesh = env
    plan = _rebind_scans(prune_columns(ctx.sql(TPCH_QUERIES[12]).plan), ctx)
    dplan = DistributedPlanner(ctx, DistOptions(n_partitions=4)).plan(plan)
    agg_exchanges = []
    for stage in dplan.stages:
        root = stage.root
        if type(root).__name__ != "ExchangeExec":
            continue
        if "shipmode" in ",".join(root.key_names):
            agg_exchanges.append(root)
    assert agg_exchanges, dplan.display()
    for ex in agg_exchanges:
        # 7 ship modes (+null slot) per shard at most; min_quota floors it
        assert ex.quota <= 4096, (ex.quota, ex._label())
