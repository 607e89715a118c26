"""h2o db-benchmark questions: correctness vs pandas at small N."""

import numpy as np
import pandas as pd
import pytest

from ballista_tpu.benchmarks.h2o import (GROUPBY_QUERIES, JOIN_QUERIES,
                                         groupby_table, join_tables)
from ballista_tpu.client import SessionContext

N = 5000


@pytest.fixture(scope="module")
def gctx():
    ctx = SessionContext()
    ctx.register_arrow("x", groupby_table(N))
    return ctx


@pytest.fixture(scope="module")
def jctx():
    ctx = SessionContext()
    tabs = join_tables(N)
    for name, t in tabs.items():
        ctx.register_arrow(name, t)
    return ctx, {k: v.to_pandas() for k, v in tabs.items()}


def test_groupby_q1_q2_q5(gctx):
    pdf = groupby_table(N).to_pandas()
    df = gctx.sql(GROUPBY_QUERIES[1]).to_pandas()
    exp = pdf.groupby("id1", sort=False)["v1"].sum().reset_index()
    assert (df.sort_values("id1").v1.values ==
            exp.sort_values("id1").v1.values).all()
    df2 = gctx.sql(GROUPBY_QUERIES[2]).to_pandas()
    exp2 = pdf.groupby(["id1", "id2"])["v1"].sum()
    assert len(df2) == len(exp2) and df2["v1"].sum() == exp2.sum()
    df5 = gctx.sql(GROUPBY_QUERIES[5]).to_pandas()
    exp5 = pdf.groupby("id6")[["v1", "v2", "v3"]].sum()
    assert len(df5) == len(exp5)
    np.testing.assert_allclose(sorted(df5["v3"]), sorted(exp5["v3"]),
                               rtol=1e-9)


def test_groupby_q6_median_stddev(gctx):
    pdf = groupby_table(N).to_pandas()
    df = gctx.sql(GROUPBY_QUERIES[6]).to_pandas()
    exp = pdf.groupby(["id4", "id5"])["v3"].agg(["median", "std"])
    assert len(df) == len(exp)
    got = df.set_index(["id4", "id5"]).sort_index()
    np.testing.assert_allclose(got["median_v3"], exp.sort_index()["median"],
                               rtol=1e-9)
    np.testing.assert_allclose(got["stddev_v3"], exp.sort_index()["std"],
                               rtol=1e-6)


def test_groupby_q7_q8_q9(gctx):
    pdf = groupby_table(N).to_pandas()
    df7 = gctx.sql(GROUPBY_QUERIES[7]).to_pandas()
    exp7 = (pdf.groupby("id3")["v1"].max()
            - pdf.groupby("id3")["v2"].min())
    assert len(df7) == len(exp7)
    assert df7["range_v1_v2"].sum() == exp7.sum()
    df8 = gctx.sql(GROUPBY_QUERIES[8]).to_pandas()
    exp8 = (pdf.sort_values("v3", ascending=False).groupby("id6")
            .head(2))
    assert len(df8) == len(exp8)
    np.testing.assert_allclose(df8["v3"].sum(), exp8["v3"].sum(), rtol=1e-9)
    df9 = gctx.sql(GROUPBY_QUERIES[9]).to_pandas()
    exp9 = pdf.groupby(["id2", "id4"]).apply(
        lambda d: d["v1"].corr(d["v2"]), include_groups=False)
    assert len(df9) == len(exp9)
    np.testing.assert_allclose(sorted(df9["corr"].fillna(-9)),
                               sorted(exp9.fillna(-9)), rtol=1e-8)


def test_groupby_q10(gctx):
    pdf = groupby_table(N).to_pandas()
    df = gctx.sql(GROUPBY_QUERIES[10]).to_pandas()
    exp = pdf.groupby(["id1", "id2", "id3", "id4", "id5", "id6"]).agg(
        v3=("v3", "sum"), cnt=("v3", "size"))
    assert len(df) == len(exp) and int(df["cnt"].sum()) == N


@pytest.mark.parametrize("q", sorted(JOIN_QUERIES))
def test_joins(jctx, q):
    ctx, pdfs = jctx
    df = ctx.sql(JOIN_QUERIES[q]).to_pandas()
    x = pdfs["x"]
    if q == 1:
        exp = x.merge(pdfs["small"], on="id1")
    elif q in (2, 3):
        exp = x.merge(pdfs["medium"], on="id2",
                      how="inner" if q == 2 else "left")
    elif q == 4:
        exp = x.merge(pdfs["medium"], on="id5",
                      how="left")
    else:
        exp = x.merge(pdfs["large"], on="id3", how="left")
    assert len(df) == len(exp), (len(df), len(exp))
    np.testing.assert_allclose(df["v1"].sum(), exp["v1"].sum(), rtol=1e-9)
    np.testing.assert_allclose(df["v2"].fillna(0).sum(),
                               exp["v2"].fillna(0).sum(), rtol=1e-9)


def test_nyctaxi_query():
    from ballista_tpu.benchmarks.nyctaxi import QUERIES, synthetic_tripdata
    ctx = SessionContext()
    t = synthetic_tripdata(4000)
    ctx.register_arrow("tripdata", t)
    df = ctx.sql(QUERIES["fare_amt_by_passenger"]).to_pandas()
    pdf = t.to_pandas().groupby("passenger_count")["fare_amount"]
    assert len(df) == pdf.ngroups
    got = df.set_index("passenger_count").sort_index()
    np.testing.assert_allclose(got.iloc[:, 0], pdf.min(), rtol=1e-9)
    np.testing.assert_allclose(got.iloc[:, 1], pdf.max(), rtol=1e-9)
    np.testing.assert_allclose(got.iloc[:, 2], pdf.sum(), rtol=1e-9)
