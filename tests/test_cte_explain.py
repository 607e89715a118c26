"""CTEs (WITH … AS) and EXPLAIN <sql> — DataFusion SQL surface the
reference inherits (VERDICT r1 item 10)."""

import pyarrow as pa
import pytest

from ballista_tpu.client import SessionContext


def _ctx():
    ctx = SessionContext()
    ctx.register_arrow("t", pa.table({"x": [1, 2, 3, 4],
                                      "g": ["a", "b", "a", "b"]}))
    return ctx


def test_cte_basic():
    ctx = _ctx()
    df = ctx.sql("with s as (select g, sum(x) as sx from t group by g) "
                 "select * from s where sx > 3 order by g")
    pd = df.to_pandas()
    assert pd.g.tolist() == ["a", "b"]
    assert pd.sx.tolist() == [4, 6]


def test_cte_chain_aliases_and_multiple_refs():
    ctx = _ctx()
    pd = ctx.sql(
        "with a (k, v) as (select g, sum(x) from t group by g), "
        "b as (select k, v*2 as v2 from a) "
        "select a.k, a.v, b.v2 from a join b on a.k = b.k order by a.k"
    ).to_pandas()
    assert pd.v.tolist() == [4, 6]
    assert pd.v2.tolist() == [8, 12]


def test_cte_shadows_base_table():
    ctx = _ctx()
    pd = ctx.sql("with t as (select x+10 as x from t) "
                 "select sum(x) as s from t").to_pandas()
    assert pd.s.tolist() == [50]


def test_cte_scope_does_not_leak():
    ctx = _ctx()
    ctx.sql("with s as (select x from t) select * from s")
    with pytest.raises(KeyError):
        ctx.sql("select * from s")


def test_cte_under_setop():
    ctx = _ctx()
    pd = ctx.sql("with s as (select x from t where x > 2) "
                 "select x from s union all select x from s "
                 "order by x").to_pandas()
    assert pd.x.tolist() == [3, 3, 4, 4]


def test_with_recursive_rejected():
    ctx = _ctx()
    with pytest.raises(NotImplementedError):
        ctx.sql("with recursive r as (select 1) select * from r")


def test_explain_statement():
    ctx = _ctx()
    pd = ctx.sql("explain select g, sum(x) from t group by g").to_pandas()
    assert pd.plan_type.tolist() == ["logical_plan", "physical_plan"]
    assert "Aggregate" in pd.plan[0]
    assert "TableScan" in pd.plan[0]
    # physical tier rendered (not the fallback message)
    assert "not available" not in pd.plan[1]


def test_explain_verbose_and_cte():
    ctx = _ctx()
    pd = ctx.sql("explain verbose with s as (select x from t) "
                 "select sum(x) from s").to_pandas()
    assert "Aggregate" in pd.plan[0]
