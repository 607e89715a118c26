"""Aggregate output-capacity bounding from key metadata (NDV bounds).

Distinct group tuples are hard-bounded by prod over keys of
min(dictionary size, int-bound range width, expression ndv bound); the
planner shrinks the aggregate's slot table and output capacity to that
bound so downstream operators (root sorts especially) process small
batches instead of table_size-padded ones.

Reference parity note: DataFusion sizes aggregate hash tables dynamically
(CPU heap); on TPU output shapes are static, so this bound is the moral
equivalent of its row-estimate-driven memory reservation.
"""

import numpy as np
import pandas as pd
import pytest

from ballista_tpu.client import SessionContext
from ballista_tpu.client.context import _rebind_scans
from ballista_tpu.exec.plan import HashAggregateExec
from ballista_tpu.planner.physical import create_physical_plan


def _aggs(ctx, sql):
    plan = _rebind_scans(ctx.sql(sql).plan, ctx)
    caps = {n: tp.capacity for n, tp in ctx.tables.items()}
    ep = create_physical_plan(plan, caps, ctx.options)
    out = []

    def walk(n):
        if isinstance(n, HashAggregateExec):
            out.append(n)
        for c in n.children:
            walk(c)
    walk(ep)
    return out


@pytest.fixture(scope="module")
def ctx():
    rng = np.random.default_rng(7)
    n = 5000
    df = pd.DataFrame({
        "k": rng.integers(0, 40, n),           # int_bound width 40
        "d": (pd.to_datetime("1995-01-01") + pd.to_timedelta(
            rng.integers(0, 365 * 3, n), unit="D")).date,
        "v": rng.integers(0, 1000, n).astype(np.int64),
    })
    c = SessionContext()
    c.register_pandas("t", df)
    c._df = df
    return c


def test_int_bound_key_shrinks_capacity(ctx):
    aggs = _aggs(ctx, "select k, sum(v) s from t group by k")
    assert len(aggs) == 1
    # 40 distinct + null slot, well under the 5000-row default sizing
    assert aggs[0].capacity <= 256
    assert aggs[0].table_size <= 256


def test_extract_year_key_bound(ctx):
    aggs = _aggs(ctx, "select extract(year from d) y, count(*) c "
                      "from t group by y")
    assert aggs[0].capacity <= 256  # 3 distinct years


def test_date_trunc_month_key_bound(ctx):
    aggs = _aggs(ctx, "select date_trunc('month', d) m, count(*) c "
                      "from t group by m")
    # ~37 months; the raw day-range width (~1100) would not bound this
    assert aggs[0].capacity <= 256


def test_results_exact_under_bounding(ctx):
    got = ctx.sql("select k, sum(v) s, count(*) c from t group by k "
                  "order by k").to_pandas()
    exp = (ctx._df.groupby("k").agg(s=("v", "sum"), c=("v", "count"))
           .reset_index().sort_values("k"))
    assert (got["k"].to_numpy() == exp["k"].to_numpy()).all()
    assert (got["s"].to_numpy() == exp["s"].to_numpy()).all()
    assert (got["c"].to_numpy() == exp["c"].to_numpy()).all()


def test_year_group_exact(ctx):
    got = ctx.sql("select extract(year from d) y, sum(v) s from t "
                  "group by y order by y").to_pandas()
    exp = (ctx._df.assign(y=pd.to_datetime(ctx._df["d"]).dt.year).groupby("y")
           .agg(s=("v", "sum")).reset_index().sort_values("y"))
    assert (got["y"].to_numpy() == exp["y"].to_numpy()).all()
    assert (got["s"].to_numpy() == exp["s"].to_numpy()).all()
