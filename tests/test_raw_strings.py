"""RAW (unsorted) high-cardinality string columns.

When a string column's estimated distinct count exceeds
BALLISTA_RAW_DICT_MAX, ingest skips sorted-dictionary encoding: the
"dictionary" is the column verbatim (code == row index). LIKE / = / IN
evaluate host-side into boolean LUTs exactly as before; joins re-encode
through a sorted union on demand; code-ORDER operations (GROUP BY,
ORDER BY, min/max, range compares, window keys) re-encode on demand via
exprs.sorted_recode (dense-rank LUT from pyarrow's C++ rank kernel).
This is what makes TPC-H SF100 ingest feasible (~450M distinct
comments; reference: DataFusion reads strings natively, shuffle_writer.rs
just streams Arrow — our fixed-shape device model needs codes).
"""

import numpy as np
import pandas as pd
import pytest

from ballista_tpu.client import SessionContext


def _make_ctx(monkeypatch, n=5000):
    # threshold far below n and NDV ~ n so the sample estimator fires
    monkeypatch.setenv("BALLISTA_RAW_DICT_MAX", "100")
    rng = np.random.default_rng(11)
    strs = np.array([f"comment-{i:06d}-{'xyz' if i % 7 == 0 else 'abc'}"
                     for i in range(n)], dtype=object)
    rng.shuffle(strs)
    df = pd.DataFrame({
        "k": np.arange(n, dtype=np.int64) % 97,
        "s": strs,
        "v": rng.integers(0, 100, n).astype(np.int64),
    })
    ctx = SessionContext()
    ctx.register_pandas("t", df)
    ctx._df = df
    return ctx


def test_raw_mode_engaged(monkeypatch):
    ctx = _make_ctx(monkeypatch)
    tp = ctx.tables["t"]
    tp._ensure()
    assert "s" in tp.schema.unsorted


def test_like_on_raw(monkeypatch):
    ctx = _make_ctx(monkeypatch)
    got = ctx.sql("select k, v from t where s like '%xyz%' order by k, v"
                  ).to_pandas()
    df = ctx._df
    exp = (df[df["s"].str.contains("xyz")][["k", "v"]]
           .sort_values(["k", "v"]))
    assert (got["k"].to_numpy() == exp["k"].to_numpy()).all()
    assert (got["v"].to_numpy() == exp["v"].to_numpy()).all()


def test_equality_on_raw(monkeypatch):
    ctx = _make_ctx(monkeypatch)
    needle = str(ctx._df["s"].iloc[42])
    got = ctx.sql(f"select count(*) c from t where s = '{needle}'").to_pandas()
    assert got["c"].iloc[0] == int((ctx._df["s"] == needle).sum())
    got = ctx.sql(f"select count(*) c from t where s <> '{needle}'").to_pandas()
    assert got["c"].iloc[0] == int((ctx._df["s"] != needle).sum())


def test_in_list_on_raw(monkeypatch):
    ctx = _make_ctx(monkeypatch)
    a, b = str(ctx._df["s"].iloc[1]), str(ctx._df["s"].iloc[2])
    got = ctx.sql(f"select count(*) c from t where s in ('{a}', '{b}', 'nope')"
                  ).to_pandas()
    assert got["c"].iloc[0] == 2


def test_materialize_raw(monkeypatch):
    ctx = _make_ctx(monkeypatch)
    got = ctx.sql("select s, v from t where k = 13 order by v").to_pandas()
    df = ctx._df
    exp = df[df["k"] == 13]
    # duplicate v values make tie order engine-defined: compare multisets
    assert sorted(got["s"].tolist()) == sorted(exp["s"].tolist())
    assert got["v"].tolist() == sorted(exp["v"].tolist())


def test_join_on_raw_key(monkeypatch):
    # joining ON a raw column re-encodes through the sorted union
    ctx = _make_ctx(monkeypatch, n=3000)
    df = ctx._df
    other = pd.DataFrame({"s2": df["s"].iloc[::3].astype(object),
                          "w": np.arange(1000, dtype=np.int64)})
    ctx.register_pandas("u", other)
    got = ctx.sql("select sum(t.v) sv, sum(u.w) sw from t "
                  "join u on t.s = u.s2").to_pandas()
    exp = df.merge(other, left_on="s", right_on="s2")
    assert got["sv"].iloc[0] == exp["v"].sum()
    assert got["sw"].iloc[0] == exp["w"].sum()


def test_order_by_raw(monkeypatch):
    # re-encode on demand (exprs.sorted_recode): dense-rank codes make
    # code order lexicographic, payload columns keep raw codes
    ctx = _make_ctx(monkeypatch)
    got = ctx.sql("select s from t order by s").to_pandas()
    assert got["s"].tolist() == sorted(ctx._df["s"].tolist())


def test_order_by_raw_desc_limit(monkeypatch):
    ctx = _make_ctx(monkeypatch)
    got = ctx.sql("select s from t order by s desc limit 7").to_pandas()
    assert got["s"].tolist() == sorted(ctx._df["s"].tolist())[::-1][:7]


def test_group_by_raw(monkeypatch):
    ctx = _make_ctx(monkeypatch, n=4000)
    # force duplicates: each string appears 1-3 times
    df = ctx._df.copy()
    dup = pd.concat([df, df.iloc[::2], df.iloc[::5]], ignore_index=True)
    ctx2 = SessionContext()
    import os
    os.environ["BALLISTA_RAW_DICT_MAX"] = "100"
    ctx2.register_pandas("t", dup)
    # raw-ness is discovered at column-ensure time (schema metadata is
    # lazy per referenced column since the SF10 ingest-latency fix)
    ctx2.tables["t"].ensure_meta(["s"])
    assert "s" in ctx2.tables["t"].schema.unsorted
    got = (ctx2.sql("select s, count(*) c, sum(v) sv from t group by s "
                    "order by s").to_pandas())
    exp = (dup.groupby("s", sort=True).agg(c=("v", "size"), sv=("v", "sum"))
           .reset_index())
    assert got["s"].tolist() == exp["s"].tolist()
    assert got["c"].tolist() == exp["c"].tolist()
    assert got["sv"].tolist() == exp["sv"].tolist()


def test_min_max_raw(monkeypatch):
    ctx = _make_ctx(monkeypatch)
    got = ctx.sql("select min(s) m, max(s) x from t").to_pandas()
    assert got["m"].iloc[0] == min(ctx._df["s"])
    assert got["x"].iloc[0] == max(ctx._df["s"])


def test_min_max_raw_grouped(monkeypatch):
    ctx = _make_ctx(monkeypatch)
    got = ctx.sql("select k, min(s) m, max(s) x from t group by k "
                  "order by k").to_pandas()
    exp = (ctx._df.groupby("k", sort=True)["s"].agg(["min", "max"])
           .reset_index())
    assert got["m"].tolist() == exp["min"].tolist()
    assert got["x"].tolist() == exp["max"].tolist()


def test_range_compare_raw(monkeypatch):
    ctx = _make_ctx(monkeypatch)
    got = ctx.sql("select count(*) c from t where s < 'comment-002000'"
                  ).to_pandas()
    exp = int((ctx._df["s"] < "comment-002000").sum())
    assert got["c"].iloc[0] == exp


def test_window_over_raw(monkeypatch):
    ctx = _make_ctx(monkeypatch, n=300)
    got = ctx.sql("select s, row_number() over (order by s) rn from t "
                  "order by s").to_pandas()
    assert got["rn"].tolist() == list(range(1, 301))


def test_default_threshold_keeps_sorted():
    # small tables stay sorted-dictionary encoded (no behavior change)
    ctx = SessionContext()
    ctx.register_pandas("t", pd.DataFrame({"s": ["b", "a", "c"] * 10}))
    tp = ctx.tables["t"]
    tp._ensure()
    assert not tp.schema.unsorted
    got = ctx.sql("select min(s) m, max(s) x from t").to_pandas()
    assert got["m"].iloc[0] == "a" and got["x"].iloc[0] == "c"


def test_tpch_all_raw(monkeypatch):
    """TPC-H with EVERY string column in raw mode (the SF100 ingest
    representation): grouping, ordering, min/max, joins, LIKE all go
    through the raw paths. Queries chosen to cover group-by-string (q1),
    order-by-string via join (q2 min cost supplier), string min/max and
    LIKE (q9 p_name like), and raw join keys (q13 comment filter)."""
    monkeypatch.setenv("BALLISTA_RAW_DICT_MAX", "0")
    from ballista_tpu.benchmarks.oracle import ORACLES, diff_frames, to_pd
    from ballista_tpu.benchmarks.queries import TPCH_QUERIES
    from ballista_tpu.datagen import generate_tpch, register_tpch
    from ballista_tpu import batch as B

    ctx = SessionContext()
    data = generate_tpch(0.01)
    register_tpch(ctx, 0.01, data=data)
    assert any(tp._ensure() or tp.schema.unsorted
               for tp in ctx.tables.values())
    pdt = to_pd(data)
    for q in (1, 2, 9, 13):
        out, schema = ctx.collect(ctx.sql(TPCH_QUERIES[q]).plan)
        got = B.to_pandas(out, schema)
        assert not diff_frames(got, ORACLES[q](pdt)), f"q{q} mismatch"
