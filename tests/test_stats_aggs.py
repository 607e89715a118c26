"""Statistics aggregates: stddev/var/corr/median/percentile vs numpy/pandas
oracles, local and distributed (shuffle fallback for non-decomposable)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ballista_tpu.client import SessionContext


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(5)
    n = 3000
    return pa.table({
        "g": rng.integers(0, 12, n),
        "x": rng.normal(50, 12, n),
        "y": rng.normal(0, 3, n) + np.repeat(np.arange(n // 100), 100) * 0.01,
        "i": rng.integers(-100, 100, n),
    })


def _ctx(data, **kw):
    c = SessionContext(**kw)
    c.register_arrow("t", data)
    return c


def test_stddev_var_grouped(data):
    df = _ctx(data).sql("""
      select g, stddev(x) as sd, var(x) as v, stddev_pop(x) as sdp,
             var_pop(x) as vp from t group by g order by g
    """).to_pandas()
    exp = data.to_pandas().groupby("g")["x"]
    np.testing.assert_allclose(df["sd"], exp.std(ddof=1), rtol=1e-9)
    np.testing.assert_allclose(df["v"], exp.var(ddof=1), rtol=1e-9)
    np.testing.assert_allclose(df["sdp"], exp.std(ddof=0), rtol=1e-9)
    np.testing.assert_allclose(df["vp"], exp.var(ddof=0), rtol=1e-9)


def test_corr_grouped(data):
    df = _ctx(data).sql(
        "select g, corr(x, y) as c from t group by g order by g").to_pandas()
    pdf = data.to_pandas()
    exp = pdf.groupby("g").apply(
        lambda d: d["x"].corr(d["y"]), include_groups=False)
    np.testing.assert_allclose(df["c"], exp.values, rtol=1e-8)


def test_median_and_percentile(data):
    df = _ctx(data).sql("""
      select g, median(x) as m, approx_percentile_cont(x, 0.25) as q1,
             percentile_cont(i, 0.9) as p90
      from t group by g order by g
    """).to_pandas()
    pdf = data.to_pandas().groupby("g")
    np.testing.assert_allclose(df["m"], pdf["x"].median(), rtol=1e-12)
    np.testing.assert_allclose(df["q1"], pdf["x"].quantile(0.25), rtol=1e-12)
    np.testing.assert_allclose(df["p90"], pdf["i"].quantile(0.9), rtol=1e-12)


def test_global_stats(data):
    df = _ctx(data).sql(
        "select stddev(x) as sd, median(x) as m, corr(x, y) as c from t"
    ).to_pandas()
    pdf = data.to_pandas()
    np.testing.assert_allclose(df["sd"][0], pdf["x"].std(ddof=1), rtol=1e-9)
    np.testing.assert_allclose(df["m"][0], pdf["x"].median(), rtol=1e-12)
    np.testing.assert_allclose(df["c"][0], pdf["x"].corr(pdf["y"]),
                               rtol=1e-8)


def test_stats_with_nulls():
    t = pa.table({"g": [1, 1, 1, 2, 2, 3],
                  "x": pa.array([1.0, None, 3.0, 5.0, None, None])})
    df = _ctx(t).sql("""
      select g, stddev(x) as sd, median(x) as m, var_pop(x) as vp
      from t group by g order by g
    """).to_pandas()
    np.testing.assert_allclose(df["sd"][0], np.std([1, 3], ddof=1))
    assert df["m"][0] == 2.0
    # single value: stddev_samp NULL, var_pop 0
    assert pd.isna(df["sd"][1]) and df["m"][1] == 5.0 and df["vp"][1] == 0.0
    # all-null group
    assert pd.isna(df["sd"][2]) and pd.isna(df["m"][2])


@pytest.mark.parametrize("mode", ["distributed", "serial"])
def test_stats_distributed_matches_local(data, mode):
    q = ("select g, stddev(x) as sd, median(x) as m, corr(x, y) as c, "
         "approx_percentile_cont(i, 0.75) as p from t group by g order by g")
    local = _ctx(data).sql(q).to_pandas()
    if mode == "serial":
        other = _ctx(data, serial_partitions=4).sql(q).to_pandas()
    else:
        other = _ctx(data, distributed=True).sql(q).to_pandas()
    pd.testing.assert_frame_equal(other.reset_index(drop=True),
                                  local.reset_index(drop=True),
                                  check_dtype=False, atol=1e-9)


def test_global_median_distributed(data):
    q = "select median(x) as m, stddev(y) as s from t"
    local = _ctx(data).sql(q).to_pandas()
    dist = _ctx(data, distributed=True).sql(q).to_pandas()
    pd.testing.assert_frame_equal(dist, local, check_dtype=False, atol=1e-9)
