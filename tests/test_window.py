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


def test_ntile_percent_rank_cume_dist(ctx):
    df = ctx.sql("""
      select g, v,
             ntile(2) over (partition by g order by v) as nt,
             percent_rank() over (partition by g order by v) as pr,
             cume_dist() over (partition by g order by v) as cd
      from t order by g, v
    """).to_pandas()
    # partition a (3 rows): ntile(2) -> buckets 1,1,2
    assert list(df["nt"][:3]) == [1, 1, 2]
    assert list(df["nt"][3:5]) == [1, 2]
    assert list(df["nt"][5:]) == [1]
    # percent_rank = (rank-1)/(size-1); peers share rank
    np.testing.assert_allclose(df["pr"][:3], [0.0, 0.5, 0.5])
    np.testing.assert_allclose(df["pr"][3:5], [0.0, 1.0])
    assert df["pr"].iloc[5] == 0.0  # single-row partition
    # cume_dist = rows <= current (peers count) / size
    np.testing.assert_allclose(df["cd"][:3], [1 / 3, 1.0, 1.0])
    np.testing.assert_allclose(df["cd"][3:5], [0.5, 1.0])


def test_ntile_more_buckets_than_rows(ctx):
    df = ctx.sql("""
      select v, ntile(5) over (order by v) as nt
      from t where g = 'a' order by v
    """).to_pandas()
    assert list(df["nt"]) == [1, 2, 3]


def test_nth_value(ctx):
    df = ctx.sql("""
      select g, v,
             nth_value(v, 2) over (partition by g order by v) as n2
      from t order by g, v
    """).to_pandas()
    # default frame RANGE..CURRENT: NULL until the frame reaches row 2
    # (peers v=20,20 share the frame end, so both see n2)
    assert pd.isna(df["n2"].iloc[0]) and list(df["n2"][1:3]) == [20, 20]
    assert pd.isna(df["n2"].iloc[3]) and df["n2"].iloc[4] == 7
    assert pd.isna(df["n2"].iloc[5])


def test_rows_frame_sliding_sum(ctx):
    df = ctx.sql("""
      select g, v,
             sum(v) over (partition by g order by v
                          rows between 1 preceding and current row) as s,
             count(v) over (partition by g order by v
                            rows between 1 preceding and 1 following) as c
      from t order by g, v
    """).to_pandas()
    assert list(df["s"][:3]) == [10, 30, 40]
    assert list(df["s"][3:5]) == [5, 12]
    assert list(df["c"][:3]) == [2, 3, 2]


def test_rows_frame_sliding_min_max(ctx):
    df = ctx.sql("""
      select g, v,
             min(v) over (partition by g order by v desc
                          rows between 1 preceding and current row) as mn,
             max(v) over (partition by g order by v
                          rows between current row and 1 following) as mx
      from t where g = 'a' order by v
    """).to_pandas()
    # order desc: 20,20,10 -> sliding min over prev+current
    assert list(df["mx"]) == [20, 20, 20]
    # desc order 20,20,10: sliding min over (prev, current) = 20, 20, 10
    assert sorted(df["mn"]) == [10, 20, 20]


def test_rows_frame_unbounded_following(ctx):
    df = ctx.sql("""
      select v,
             sum(v) over (order by v rows between current row
                          and unbounded following) as tail,
             last_value(v) over (order by v rows between current row
                                 and unbounded following) as lv
      from t where g = 'a' order by v
    """).to_pandas()
    assert list(df["tail"]) == [50, 40, 20]
    assert list(df["lv"]) == [20, 20, 20]


def test_rows_frame_shorthand(ctx):
    # ROWS 2 PRECEDING == BETWEEN 2 PRECEDING AND CURRENT ROW
    df = ctx.sql("""
      select v, sum(v) over (order by v rows 2 preceding) as s
      from t where g = 'a' order by v
    """).to_pandas()
    assert list(df["s"]) == [10, 30, 50]


def test_rows_frame_empty(ctx):
    # frame entirely after the partition end -> empty: sum NULL, count 0
    df = ctx.sql("""
      select v,
             sum(v) over (order by v rows between 2 following
                          and 3 following) as s,
             count(v) over (order by v rows between 2 following
                            and 3 following) as c
      from t where g = 'b' order by v
    """).to_pandas()
    assert pd.isna(df["s"].iloc[0]) and pd.isna(df["s"].iloc[1])
    assert list(df["c"]) == [0, 0]


def test_range_current_row_frame(ctx):
    # RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING: frame starts at
    # the first peer
    df = ctx.sql("""
      select v, sum(v) over (order by v range between current row
                             and unbounded following) as s
      from t where g = 'a' order by v
    """).to_pandas()
    assert list(df["s"]) == [50, 40, 40]


def test_windowed_frames_vs_pandas_random():
    rng = np.random.default_rng(7)
    n = 500
    g = rng.integers(0, 8, n)
    v = rng.integers(-50, 50, n).astype("int64")
    mask = rng.random(n) < 0.1
    vals = pd.array(v, dtype="Int64")
    vals[mask] = pd.NA
    t = pa.table({"g": g, "v": pa.array(vals), "tie": np.arange(n)})
    c = SessionContext()
    c.register_arrow("r", t)
    df = c.sql("""
      select g, tie,
             sum(v) over (partition by g order by tie
                          rows between 3 preceding and 1 following) as s,
             min(v) over (partition by g order by tie
                          rows between 3 preceding and 1 following) as mn,
             max(v) over (partition by g order by tie
                          rows between 2 preceding and 2 following) as mx,
             avg(v) over (partition by g order by tie
                          rows between 3 preceding and current row) as a
      from r order by g, tie
    """).to_pandas()
    pdf = t.to_pandas().sort_values(["g", "tie"]).reset_index(drop=True)
    # oracle: explicit python loop over each partition's frame
    exp = {"s": [], "mn": [], "mx": [], "a": []}
    for _, grp in pdf.groupby("g", sort=True):
        vv = grp["v"].tolist()
        m = len(vv)
        for i in range(m):
            win = [x for x in vv[max(0, i - 3):i + 2] if x is not pd.NA]
            win = [x for x in win if not pd.isna(x)]
            exp["s"].append(sum(win) if win else None)
            exp["mn"].append(min(win) if win else None)
            w2 = [x for x in vv[max(0, i - 2):i + 3] if not pd.isna(x)]
            exp["mx"].append(max(w2) if w2 else None)
            w3 = [x for x in vv[max(0, i - 3):i + 1] if not pd.isna(x)]
            exp["a"].append(sum(w3) / len(w3) if w3 else None)
    for colname in ("s", "mn", "mx"):
        got = [None if pd.isna(x) else int(x) for x in df[colname]]
        want = [None if x is None else int(x) for x in exp[colname]]
        assert got == want, colname
    gota = [None if pd.isna(x) else float(x) for x in df["a"]]
    wanta = [None if x is None else float(x) for x in exp["a"]]
    np.testing.assert_allclose(
        [x for x in gota if x is not None],
        [x for x in wanta if x is not None], rtol=1e-9)
