"""Window functions: SQL surface, kernels, distributed, serde."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ballista_tpu.client import SessionContext


@pytest.fixture(scope="module")
def ctx():
    c = SessionContext()
    c.register_arrow("t", pa.table({
        "g": pa.array(["a", "a", "a", "b", "b", "c"]),
        "v": pa.array([10, 20, 20, 5, 7, None], pa.int64()),
    }))
    return c


def test_ranking(ctx):
    df = ctx.sql("""
      select g, v,
             row_number() over (partition by g order by v) as rn,
             rank() over (partition by g order by v) as rk,
             dense_rank() over (partition by g order by v) as dr
      from t order by g, v
    """).to_pandas()
    assert list(df["rn"]) == [1, 2, 3, 1, 2, 1]
    assert list(df["rk"]) == [1, 2, 2, 1, 2, 1]
    assert list(df["dr"]) == [1, 2, 2, 1, 2, 1]


def test_partition_aggregates(ctx):
    df = ctx.sql("""
      select g, v,
             sum(v) over (partition by g) as total,
             count(v) over (partition by g) as cnt,
             min(v) over (partition by g) as mn,
             max(v) over (partition by g) as mx,
             avg(v) over (partition by g) as mean
      from t order by g, v
    """).to_pandas()
    assert list(df["total"][:3]) == [50, 50, 50]
    assert list(df["cnt"]) == [3, 3, 3, 2, 2, 0]
    assert list(df["mn"][:3]) == [10, 10, 10]
    assert list(df["mx"][3:5]) == [7, 7]
    # all-null partition c: sum/min/max/avg are NULL, count 0
    assert pd.isna(df["total"].iloc[5])
    assert pd.isna(df["mn"].iloc[5])
    np.testing.assert_allclose(df["mean"][:3].astype(float), 50 / 3,
                               rtol=1e-6)


def test_running_sum_with_peers(ctx):
    # SQL default frame is RANGE: peers (v=20,20) share the frame end
    df = ctx.sql("""
      select g, v, sum(v) over (partition by g order by v) as run
      from t where g = 'a' order by v
    """).to_pandas()
    assert list(df["run"]) == [10, 50, 50]


def test_lag_lead_first_last(ctx):
    df = ctx.sql("""
      select g, v,
             lag(v) over (partition by g order by v) as prev,
             lead(v) over (partition by g order by v) as nxt,
             first_value(v) over (partition by g order by v) as fv,
             last_value(v) over (partition by g order by v) as lv
      from t where g = 'b' order by v
    """).to_pandas()
    assert pd.isna(df["prev"].iloc[0]) and df["prev"].iloc[1] == 5
    assert df["nxt"].iloc[0] == 7 and pd.isna(df["nxt"].iloc[1])
    assert list(df["fv"]) == [5, 5]
    assert list(df["lv"]) == [5, 7]


def test_lag_offset(ctx):
    df = ctx.sql("""
      select v, lag(v, 2) over (order by v) as p2
      from t where v is not null order by v
    """).to_pandas()
    assert pd.isna(df["p2"].iloc[0]) and pd.isna(df["p2"].iloc[1])
    assert list(df["p2"][2:]) == [5, 7, 10]


def test_window_over_aggregate(ctx):
    df = ctx.sql("""
      select g, sum(v) as s, rank() over (order by sum(v) desc) as rk
      from t group by g order by g
    """).to_pandas()
    # sums: a=50, b=12, c=NULL (desc -> nulls first per DataFusion default)
    assert list(df["rk"]) == [2, 3, 1]


def test_no_partition_by(ctx):
    df = ctx.sql("""
      select v, row_number() over (order by v desc) as rn
      from t where v is not null order by v desc
    """).to_pandas()
    assert list(df["rn"]) == [1, 2, 3, 4, 5]


def test_cumulative_min_max(ctx):
    df = ctx.sql("""
      select g, v,
             min(v) over (partition by g order by v desc) as cmn,
             max(v) over (partition by g order by v) as cmx
      from t where v is not null order by g, v
    """).to_pandas()
    # group a sorted by v asc: cmx = 10,20,20 ; cmn over v desc frames:
    # row v=10 (last in desc order) -> min(20,20,10)=10; v=20 rows are
    # peers at the desc front -> min(20,20)=20
    assert list(df["cmx"][:3]) == [10, 20, 20]
    assert list(df["cmn"][:3]) == [10, 20, 20]
    assert list(df["cmx"][3:5]) == [5, 7]
    assert list(df["cmn"][3:5]) == [5, 7]


def test_window_serde_roundtrip(ctx):
    from ballista_tpu.serde.plans import plan_from_json, plan_to_json
    plan = ctx.sql(
        "select g, row_number() over (partition by g order by v) rn "
        "from t").plan
    rt = plan_from_json(plan_to_json(plan))
    assert rt.display() == plan.display()
