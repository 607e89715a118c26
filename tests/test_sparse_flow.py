"""Sparse-batch (live-mask) flow: filters/inner joins under mask-aware
consumers skip output compaction (exec/plan.py plan_sparse_flow)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ctx():
    from ballista_tpu.client import SessionContext
    rng = np.random.default_rng(7)
    n, m = 500, 80
    ctx = SessionContext()
    ctx.register_arrow("f", pa.table({
        "k": rng.integers(0, m, n),
        "v": rng.integers(0, 1000, n),
        "flag": rng.integers(0, 2, n).astype(bool),
    }))
    ctx.register_arrow("d", pa.table({
        "k": np.arange(m),
        "grp": rng.integers(0, 5, m),
    }))
    return ctx, n, m


def test_sparse_marks_set():
    from ballista_tpu.client.context import _rebind_scans
    from ballista_tpu.exec.plan import FilterExec, HashJoinExec
    from ballista_tpu.planner.physical import create_physical_plan
    ctx, _, _ = _ctx()
    df = ctx.sql("select d.grp, sum(f.v) s from f join d on f.k = d.k "
                 "where f.v > 100 group by d.grp order by d.grp")
    plan = _rebind_scans(df.plan, ctx)
    caps = {t: tp.capacity for t, tp in ctx.tables.items()}
    ep = create_physical_plan(plan, caps, ctx.options)

    marked = []

    def walk(n):
        if isinstance(n, (FilterExec, HashJoinExec)) and n.emit_sparse:
            marked.append(type(n).__name__)
        for c in n.children:
            walk(c)
    walk(ep)
    assert marked, "no operator elided compaction under the aggregate"


def test_sparse_results_match_pandas():
    ctx, _, _ = _ctx()
    out = ctx.sql(
        "select d.grp, count(*) n, sum(f.v) s from f join d on f.k = d.k "
        "where f.v > 100 and f.flag group by d.grp order by d.grp").to_pandas()
    f = ctx.tables["f"].arrow_table.to_pandas()
    d = ctx.tables["d"].arrow_table.to_pandas()
    j = f[(f.v > 100) & f.flag].merge(d, on="k")
    exp = (j.groupby("grp").agg(n=("v", "size"), s=("v", "sum"))
            .reset_index().sort_values("grp"))
    assert list(out["n"]) == list(exp["n"])
    assert list(out["s"]) == list(exp["s"])


def test_sparse_filter_feeds_sort():
    ctx, _, _ = _ctx()
    out = ctx.sql("select v from f where v > 900 order by v desc").to_pandas()
    f = ctx.tables["f"].arrow_table.to_pandas()
    exp = sorted(f[f.v > 900].v.tolist(), reverse=True)
    assert list(out["v"]) == exp


def test_sparse_semi_join_under_agg():
    ctx, _, _ = _ctx()
    out = ctx.sql(
        "select count(*) n from f where f.k in "
        "(select k from d where grp = 2)").to_pandas()
    f = ctx.tables["f"].arrow_table.to_pandas()
    d = ctx.tables["d"].arrow_table.to_pandas()
    exp = f[f.k.isin(d[d.grp == 2].k)].shape[0]
    assert int(out["n"][0]) == exp


def test_cse_dedups_identical_subtrees():
    from ballista_tpu.client.context import _rebind_scans
    from ballista_tpu.planner.physical import create_physical_plan
    ctx, _, _ = _ctx()
    df = ctx.sql("select k, sum(v) s from f group by k "
                 "union all select k, sum(v) s from f group by k")
    plan = _rebind_scans(df.plan, ctx)
    caps = {t: tp.capacity for t, tp in ctx.tables.items()}
    ep = create_physical_plan(plan, caps, ctx.options)
    # the two identical aggregate subtrees must share ONE node object
    # (the union branches differ only by a rename projection above them)
    from ballista_tpu.exec.plan import HashAggregateExec

    aggs = []

    def find(n):
        if isinstance(n, HashAggregateExec):
            aggs.append(n)
        for c in n.children:
            find(c)
    find(ep)
    assert len(aggs) == 2 and aggs[0] is aggs[1]
    # and results are still two copies of the group-by
    out = ctx.sql("select k, sum(v) s from f group by k "
                  "union all select k, sum(v) s from f group by k").to_pandas()
    f = ctx.tables["f"].arrow_table.to_pandas()
    exp = f.groupby("k").v.sum()
    assert len(out) == 2 * len(exp)
