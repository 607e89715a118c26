"""Edge cases: empty tables, fully-filtered batches, single rows, nulls."""

import numpy as np
import pyarrow as pa
import pytest

from ballista_tpu.client import SessionContext


@pytest.fixture(scope="module")
def ctx():
    c = SessionContext()
    c.register_arrow("empty", pa.table({
        "k": pa.array([], pa.int64()), "v": pa.array([], pa.float32()),
        "s": pa.array([], pa.string())}))
    c.register_arrow("one", pa.table({
        "k": pa.array([42], pa.int64()), "v": pa.array([1.5], pa.float32())}))
    c.register_arrow("nullt", pa.table({
        "k": pa.array([1, None, 3], pa.int64()),
        "v": pa.array([None, None, None], pa.float32())}))
    c.register_arrow("big", pa.table({
        "k": pa.array(list(range(100)), pa.int64()),
        "g": pa.array(["a", "b"] * 50)}), primary_key=("k",))
    return c


def test_empty_table_scan_and_agg(ctx):
    df = ctx.sql("select count(*) as n, sum(v) as s from empty").to_pandas()
    assert int(df["n"][0]) == 0
    assert np.isnan(df["s"][0])  # SUM over empty = NULL


def test_empty_group_by(ctx):
    df = ctx.sql("select s, count(*) as n from empty group by s").to_pandas()
    assert len(df) == 0


def test_filter_eliminates_all(ctx):
    df = ctx.sql("select k from big where k < 0").to_pandas()
    assert len(df) == 0


def test_join_with_empty_side(ctx):
    df = ctx.sql("select one.k from one, empty where one.k = empty.k").to_pandas()
    assert len(df) == 0
    df2 = ctx.sql(
        "select big.k from big left join empty on big.k = empty.k "
        "order by big.k limit 3").to_pandas()
    assert list(df2["k"]) == [0, 1, 2]


def test_single_row(ctx):
    df = ctx.sql("select k, v from one where v > 1").to_pandas()
    assert list(df["k"]) == [42]


def test_all_null_aggregates(ctx):
    df = ctx.sql("select sum(v) as s, min(v) as mn, count(v) as c, "
                 "count(*) as n from nullt").to_pandas()
    assert np.isnan(df["s"][0]) and np.isnan(df["mn"][0])
    assert int(df["c"][0]) == 0 and int(df["n"][0]) == 3


def test_group_by_null_key(ctx):
    df = ctx.sql("select k, count(*) as n from nullt group by k "
                 "order by k nulls first").to_pandas()
    assert len(df) == 3
    assert df["k"].isna().iloc[0]


class TestFromlessAndModulo:
    def test_select_without_from(self):
        from ballista_tpu.client import SessionContext
        ctx = SessionContext()
        df = ctx.sql("select 1 + 1 as two, 7 * 6 as ans").to_pandas()
        assert len(df) == 1
        assert int(df["two"][0]) == 2 and int(df["ans"][0]) == 42

    def test_modulo_and_trunc_division(self):
        import pyarrow as pa

        from ballista_tpu.client import SessionContext
        ctx = SessionContext()
        ctx.register_arrow("m", pa.table({
            "a": pa.array([7, -7, 7, -7, 5, 0], pa.int64()),
            "b": pa.array([2, 2, -2, -2, 0, 3], pa.int64()),
        }))
        df = ctx.sql("select a, b, a % b as m, a / b as d from m").to_pandas()
        # SQL semantics: / truncates toward zero, % has dividend's sign
        assert [None if pd_isna(x) else int(x) for x in df["d"]] == \
            [3, -3, -3, 3, None, 0]
        got_m = [None if pd_isna(x) else int(x) for x in df["m"]]
        assert got_m == [1, -1, 1, -1, None, 0]

    def test_float_modulo(self):
        from ballista_tpu.client import SessionContext
        ctx = SessionContext()
        df = ctx.sql("select 7.5 % 2 as m").to_pandas()
        assert abs(float(df["m"][0]) - 1.5) < 1e-9


def pd_isna(x):
    import pandas as pd
    return pd.isna(x)


class TestUncorrelatedExists:
    """EXISTS/NOT EXISTS with no correlation: a global row-count fact
    (cross-joined 1-row count(*); DataFusion decorrelates these the
    same way upstream)."""

    def _ctx(self):
        import pyarrow as pa
        from ballista_tpu.client import SessionContext
        c = SessionContext()
        c.register_arrow("t", pa.table({"x": [1, 2, 3, None],
                                        "y": [10, 20, 30, 40]}))
        c.register_arrow("s", pa.table({"z": [5]}))
        c.register_arrow("e", pa.table({"z": pa.array([], type=pa.int64())}))
        return c

    def test_exists_nonempty_keeps_all(self):
        ctx = self._ctx()
        r = ctx.sql("select y from t where exists (select 1 from s)")
        assert sorted(r.to_pandas().y) == [10, 20, 30, 40]

    def test_exists_empty_keeps_none(self):
        ctx = self._ctx()
        r = ctx.sql("select y from t where exists (select 1 from e)")
        assert len(r.to_pandas()) == 0
        r = ctx.sql(
            "select y from t where exists (select 1 from s where z = 99)")
        assert len(r.to_pandas()) == 0

    def test_not_exists(self):
        ctx = self._ctx()
        r = ctx.sql(
            "select y from t where not exists (select z from e where z > 3)")
        assert sorted(r.to_pandas().y) == [10, 20, 30, 40]
        r = ctx.sql(
            "select y from t where not exists (select 1 from s where z = 5)")
        assert len(r.to_pandas()) == 0

    def test_non_equi_correlated_exists(self):
        """Regression (ADVICE r1): correlated non-equi predicates must
        NOT be planned as an uncorrelated global count — EXISTS
        (SELECT 1 FROM s WHERE s.z > t.x) is a per-row theta semi-join."""
        import pyarrow as pa
        from ballista_tpu.client import SessionContext
        ctx = SessionContext()
        ctx.register_arrow("t", pa.table({"x": [10, 20, 30]}))
        ctx.register_arrow("s", pa.table({"z": [15]}))
        r = ctx.sql("select x from t where exists "
                    "(select 1 from s where s.z > t.x) order by x")
        assert r.to_pandas().x.tolist() == [10]
        r = ctx.sql("select x from t where not exists "
                    "(select 1 from s where s.z > t.x) order by x")
        assert r.to_pandas().x.tolist() == [20, 30]


class TestExpressionLhsIn:
    """`<expr> IN (subquery)` — the lhs expression is projected as a
    synthetic join-key column (uncorrelated, NOT IN three-valued, and
    correlated paths)."""

    def _ctx(self):
        import pyarrow as pa
        from ballista_tpu.client import SessionContext
        c = SessionContext()
        c.register_arrow("t", pa.table({"x": [1, 2, 3, None],
                                        "y": [10, 20, 30, 40]}))
        c.register_arrow("s", pa.table({"z": [3, 4]}))
        c.register_arrow("u", pa.table({"k": [1, 2, 3], "w": [2, 99, 4]}))
        return c

    def test_uncorrelated(self):
        ctx = self._ctx()
        r = ctx.sql("select y from t where x + 1 in (select z from s)")
        assert sorted(r.to_pandas().y) == [20, 30]

    def test_not_in_three_valued(self):
        ctx = self._ctx()
        r = ctx.sql("select y from t where x + 1 not in (select z from s)")
        assert sorted(r.to_pandas().y) == [10]

    def test_correlated(self):
        ctx = self._ctx()
        r = ctx.sql("select y from t where x + 1 in "
                    "(select w from u where u.k = t.x)")
        assert sorted(r.to_pandas().y) == [10, 30]

    def test_correlated_expression_output(self):
        import pyarrow as pa
        ctx = self._ctx()
        ctx.register_arrow("u2", pa.table({"k": [1, 2, 3],
                                           "w": [0, 99, 2]}))
        r = ctx.sql("select y from t where x in "
                    "(select w + 1 from u2 where u2.k = t.x)")
        assert sorted(r.to_pandas().y) == [10, 30]


def test_in_subquery_with_order_by_limit():
    """IN (... ORDER BY ... LIMIT k) is a top-k membership set — the
    Limit must NOT be stripped (only order is irrelevant)."""
    import pyarrow as pa
    from ballista_tpu.client import SessionContext
    ctx = SessionContext()
    ctx.register_arrow("lt", pa.table({"x": [1, 2, 3, 4]}))
    ctx.register_arrow("ls", pa.table({"z": [3, 1, 2]}))
    r = ctx.sql("select x from lt where x in "
                "(select z from ls order by z desc limit 1)").to_pandas()
    assert sorted(r.x) == [3]
    r = ctx.sql("select x from lt where x in "
                "(select z from ls order by z limit 2)").to_pandas()
    assert sorted(r.x) == [1, 2]
