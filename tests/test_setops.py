"""UNION [ALL] and RIGHT JOIN support."""

import pandas as pd
import pyarrow as pa
import pytest


def _isna(v):
    return v is None or pd.isna(v)

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


def test_full_outer_join_unique(ctx):
    # cust FULL JOIN ords on ck=k: orders kept (k=9 unmatched), cust ck=2
    # appended with null order cols
    df = ctx.sql("""
        select nm, ck, k, amt from cust full outer join ords on ck = k
        order by amt, ck
    """).to_pandas()
    rows = set()
    for _, r in df.iterrows():
        rows.add((None if _isna(r["nm"]) else str(r["nm"]),
                  None if _isna(r["ck"]) else int(r["ck"]),
                  None if _isna(r["k"]) else int(r["k"]),
                  None if _isna(r["amt"]) else int(r["amt"])))
    assert rows == {("ann", 1, 1, 10), ("ann", 1, 1, 20),
                    (None, None, 9, 30), ("bob", 2, None, None)}


def test_full_outer_join_duplicates(ctx):
    # t1 has unique x; ords.k has duplicates -> expanding build side
    df = ctx.sql("""
        select k, amt, x, y from ords full join t1 on k = x order by amt
    """).to_pandas()
    rows = set()
    for _, r in df.iterrows():
        rows.add((None if _isna(r["k"]) else int(r["k"]),
                  None if _isna(r["amt"]) else int(r["amt"]),
                  None if _isna(r["x"]) else int(r["x"]),
                  None if _isna(r["y"]) else str(r["y"])))
    assert rows == {(1, 10, 1, "a"), (1, 20, 1, "a"), (9, 30, None, None),
                    (None, None, 2, "b"), (None, None, 3, "c")}


def test_full_outer_join_unique_merge_path(ctx):
    # new side = cust (primary key ck) -> unique-build merge_full_unique path
    df = ctx.sql("""
        select k, amt, nm from ords full join cust on k = ck order by amt
    """).to_pandas()
    rows = set()
    for _, r in df.iterrows():
        rows.add((None if _isna(r["k"]) else int(r["k"]),
                  None if _isna(r["amt"]) else int(r["amt"]),
                  None if _isna(r["nm"]) else str(r["nm"])))
    assert rows == {(1, 10, "ann"), (1, 20, "ann"), (9, 30, None),
                    (None, None, "bob")}


def test_cross_join(ctx):
    df = ctx.sql("select t1.x a, t2.x b from t1 cross join t2 "
                 "order by a, b").to_pandas()
    assert len(df) == 6
    assert list(df["a"]) == [1, 1, 2, 2, 3, 3]
    assert list(df["b"]) == [3, 4, 3, 4, 3, 4]


def test_theta_join_via_comma(ctx):
    # no equality edge -> cross product + residual filter
    df = ctx.sql("select t1.x a, t2.x b from t1, t2 where t1.x + 1 = t2.x "
                 "order by a").to_pandas()
    assert list(df["a"]) == [2, 3]
    assert list(df["b"]) == [3, 4]


def test_theta_join_on_inequality(ctx):
    df = ctx.sql("select count(*) c from t1 join t2 on t1.x < t2.x").to_pandas()
    # pairs with x1 < x2: (1,3),(1,4),(2,3),(2,4),(3,4) = 5
    assert int(df["c"][0]) == 5


def test_intersect_except():
    """INTERSECT / EXCEPT with NULL-equal set semantics."""
    import pyarrow as pa
    from ballista_tpu.client import SessionContext

    ctx = SessionContext()
    ctx.register_arrow("sa", pa.table({"x": [1, 2, 2, 3, None],
                                       "s": ["p", "q", "q", "r", None]}))
    ctx.register_arrow("sb", pa.table({"x": [2, 3, 4, None],
                                       "s": ["q", "zz", "t", None]}))
    r1 = ctx.sql("select x, s from sa intersect select x, s from sb "
                 "order by x").to_pandas()
    assert r1["x"].fillna(-1).tolist() == [2, -1]
    assert r1["s"].fillna("~").tolist() == ["q", "~"]
    r2 = ctx.sql("select x, s from sa except select x, s from sb "
                 "order by x").to_pandas()
    assert r2["x"].tolist() == [1, 3]
    r3 = ctx.sql("select x from sa except select x from sa where x = 2 "
                 "order by x").to_pandas()
    assert r3["x"].fillna(-1).tolist() == [1, 3, -1]


def test_intersect_all_bag_semantics():
    from collections import Counter
    import pandas as pd
    ctx = SessionContext()
    ctx.register_arrow("ba", pa.table({"x": [1, 1, 1, 2, 2, 3, None, None]}))
    ctx.register_arrow("bb", pa.table({"x": [1, 1, 2, 4, None]}))

    def bag(r):
        return Counter(None if pd.isna(v) else int(v) for v in r.x)

    r = ctx.sql("select x from ba intersect all select x from bb").to_pandas()
    # each row appears min(l, r) times; NULLs compare equal
    assert bag(r) == Counter({1: 2, 2: 1, None: 1})


def test_except_all_bag_semantics():
    from collections import Counter
    import pandas as pd
    ctx = SessionContext()
    ctx.register_arrow("ea", pa.table({"x": [1, 1, 1, 2, 2, 3, None, None]}))
    ctx.register_arrow("eb", pa.table({"x": [1, 1, 2, 4, None]}))

    def bag(r):
        return Counter(None if pd.isna(v) else int(v) for v in r.x)

    r = ctx.sql("select x from ea except all select x from eb").to_pandas()
    # each row appears max(l - r, 0) times
    assert bag(r) == Counter({1: 1, 2: 1, 3: 1, None: 1})


def test_setop_all_multicol_order_by():
    ctx = SessionContext()
    ctx.register_arrow("ma", pa.table({"x": [1, 1, 2], "y": ["a", "a", "b"]}))
    ctx.register_arrow("mb", pa.table({"x": [1, 2], "y": ["a", "b"]}))
    r = ctx.sql("select x, y from ma except all select x, y from mb "
                "order by x").to_pandas()
    assert list(r.x) == [1] and list(r.y) == ["a"]


def test_setop_order_by_expression():
    ctx = SessionContext()
    ctx.register_arrow("oa", pa.table({"x": [3, 1, 2], "y": [1, 1, 1]}))
    ctx.register_arrow("ob", pa.table({"x": [9], "y": [0]}))
    r = ctx.sql("select x, y from oa except select x, y from ob "
                "order by x + y desc").to_pandas()
    assert list(r.x) == [3, 2, 1]


def test_setop_standard_precedence():
    """INTERSECT binds tighter than UNION/EXCEPT (SQL standard);
    mixed UNION ALL / UNION chains keep each pair's own ALL flag."""
    ctx = SessionContext()
    ctx.register_arrow("pa_", pa.table({"x": [1, 2]}))
    ctx.register_arrow("pb", pa.table({"x": [2, 3]}))
    ctx.register_arrow("pc", pa.table({"x": [2, 9]}))
    # a UNION (b INTERSECT c)
    r = ctx.sql("select x from pa_ union select x from pb "
                "intersect select x from pc").to_pandas()
    assert sorted(r.x) == [1, 2]
    # (a UNION ALL a) UNION a — outer UNION dedups everything
    r = ctx.sql("select x from pa_ union all select x from pa_ "
                "union select x from pa_").to_pandas()
    assert sorted(r.x) == [1, 2]
    # (a UNION a) UNION ALL a — append after dedup
    r = ctx.sql("select x from pa_ union select x from pa_ "
                "union all select x from pa_").to_pandas()
    assert sorted(r.x) == [1, 1, 2, 2]
