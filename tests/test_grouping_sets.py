"""GROUPING SETS / ROLLUP / CUBE (union-of-aggregates lowering)."""

import pandas as pd
import pyarrow as pa
import pytest

from ballista_tpu.client import SessionContext


@pytest.fixture(scope="module")
def ctx():
    c = SessionContext()
    c.register_arrow("s", pa.table({
        "region": pa.array(["e", "e", "w", "w", "w"]),
        "prod": pa.array(["x", "y", "x", "x", "y"]),
        "amt": pa.array([1, 2, 4, 8, 16], pa.int64()),
    }))
    return c


def rows(df, cols):
    out = set()
    for _, r in df.iterrows():
        out.add(tuple(None if pd.isna(r[c]) else r[c] for c in cols))
    return out


def test_rollup(ctx):
    df = ctx.sql("""
      select region, prod, sum(amt) as s, count(*) as c
      from s group by rollup(region, prod)
    """).to_pandas()
    assert rows(df, ["region", "prod", "s", "c"]) == {
        ("e", "x", 1, 1), ("e", "y", 2, 1), ("e", None, 3, 2),
        ("w", "x", 12, 2), ("w", "y", 16, 1), ("w", None, 28, 3),
        (None, None, 31, 5)}


def test_cube(ctx):
    df = ctx.sql("""
      select region, prod, sum(amt) as s from s group by cube(region, prod)
    """).to_pandas()
    assert rows(df, ["region", "prod", "s"]) == {
        ("e", "x", 1), ("e", "y", 2), ("e", None, 3),
        ("w", "x", 12), ("w", "y", 16), ("w", None, 28),
        (None, "x", 13), (None, "y", 18), (None, None, 31)}


def test_grouping_sets_with_having(ctx):
    df = ctx.sql("""
      select region, prod, sum(amt) as s
      from s group by grouping sets ((region), (prod), ())
      having sum(amt) > 3
    """).to_pandas()
    assert rows(df, ["region", "prod", "s"]) == {
        ("w", None, 28), (None, "x", 13), (None, "y", 18), (None, None, 31)}


def test_grouping_sets_order_by(ctx):
    df = ctx.sql("""
      select region, sum(amt) as s from s group by grouping sets ((region), ())
      order by s desc
    """).to_pandas()
    assert list(df["s"]) == [31, 28, 3]


def test_mixed_distinct_aggregates(ctx):
    # (separate feature, same two-level-aggregate machinery family)
    c2 = SessionContext()
    c2.register_arrow("t", pa.table({
        "g": pa.array(["a", "a", "a", "b", "b"]),
        "x": pa.array([1, 1, 2, 3, None], pa.int64()),
        "v": pa.array([10, 20, 30, 40, 50], pa.int64()),
    }))
    df = c2.sql("""
      select g, count(distinct x) as cd, sum(v) as sv, count(*) as c,
             avg(v) as av, min(v) as mn, sum(distinct x) as sd
      from t group by g order by g
    """).to_pandas()
    assert list(df["cd"]) == [2, 1]
    assert list(df["sv"]) == [60, 90]
    assert list(df["c"]) == [3, 2]
    assert list(df["av"]) == [20.0, 45.0]
    assert list(df["mn"]) == [10, 40]
    assert list(df["sd"]) == [3, 3]


def test_distinct_agg_nulls_skipped(ctx):
    c2 = SessionContext()
    c2.register_arrow("t", pa.table({
        "g": pa.array(["b", "b"]),
        "x": pa.array([None, None], pa.int64()),
    }))
    df = c2.sql("select g, count(distinct x) cd from t group by g").to_pandas()
    assert list(df["cd"]) == [0]
