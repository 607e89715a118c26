"""UNION [ALL] and RIGHT JOIN support."""

import pyarrow as pa
import pytest

from ballista_tpu.client import SessionContext


@pytest.fixture(scope="module")
def ctx():
    c = SessionContext()
    c.register_arrow("t1", pa.table({"x": pa.array([1, 2, 3], pa.int64()),
                                     "y": pa.array(["a", "b", "c"])}))
    c.register_arrow("t2", pa.table({"x": pa.array([3, 4], pa.int64()),
                                     "y": pa.array(["c", "d"])}))
    c.register_arrow("ords", pa.table({"k": pa.array([1, 1, 9], pa.int64()),
                                       "amt": pa.array([10, 20, 30], pa.int64())}),
                     primary_key=None)
    c.register_arrow("cust", pa.table({"ck": pa.array([1, 2], pa.int64()),
                                       "nm": pa.array(["ann", "bob"])}),
                     primary_key=("ck",))
    return c


def test_union_all(ctx):
    df = ctx.sql("select x, y from t1 union all select x, y from t2 order by x").to_pandas()
    assert list(df["x"]) == [1, 2, 3, 3, 4]


def test_union_distinct(ctx):
    df = ctx.sql("select x, y from t1 union select x, y from t2 order by x").to_pandas()
    assert list(df["x"]) == [1, 2, 3, 4]
    assert list(df["y"]) == ["a", "b", "c", "d"]


def test_union_column_count_mismatch(ctx):
    with pytest.raises(ValueError):
        ctx.sql("select x from t1 union select x, y from t2")


def test_right_join(ctx):
    # cust RIGHT JOIN ords: all orders kept, nm null for unmatched k=9
    df = ctx.sql("""
        select nm, k, amt from cust right join ords on ck = k order by amt
    """).to_pandas()
    assert list(df["amt"]) == [10, 20, 30]
    assert list(df["k"]) == [1, 1, 9]
    assert df["nm"].iloc[2] is None or str(df["nm"].iloc[2]) == "None"
