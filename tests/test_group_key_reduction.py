"""GROUP BY key elimination via functional dependencies
(planner/optimizer.py reduce_group_keys).

A single-column unique key determines every column of its table in any
derived relation; join equalities extend this transitively. Dependent
group keys demote to min() carries — constant per group, so the value
round-trips exactly (strings ride sorted-dictionary codes)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ballista_tpu.client import SessionContext
from ballista_tpu.client.context import _rebind_scans
from ballista_tpu.planner.physical import create_physical_plan


@pytest.fixture(scope="module")
def ctx():
    rng = np.random.default_rng(3)
    n_c, n_o = 40, 400
    cust = pd.DataFrame({
        "ck": np.arange(n_c),
        "name": [f"Customer#{i:03d}" for i in range(n_c)],
        "bal": rng.integers(-100, 10_000, n_c),
    })
    # one NULL name to check NULL carry
    cust.loc[7, "name"] = None
    orders = pd.DataFrame({
        "ok": np.arange(n_o),
        "ock": rng.integers(0, n_c, n_o),
        "price": rng.integers(1, 500, n_o),
    })
    c = SessionContext()
    c.register_arrow("cust", pa.Table.from_pandas(cust), primary_key=("ck",))
    c.register_arrow("orders", pa.Table.from_pandas(orders),
                     primary_key=("ok",))
    c._pd = (cust, orders)
    return c


def agg_keys(ctx, sql):
    plan = _rebind_scans(ctx.sql(sql).plan, ctx)
    caps = {n: tp.capacity for n, tp in ctx.tables.items()}
    ep = create_physical_plan(plan, caps, ctx.options)
    for line in ep.display().splitlines():
        if "HashAggregateExec" in line:
            return line.split("keys=")[1].split("]")[0] + "]"
    raise AssertionError("no aggregate in plan")


def test_dependent_keys_demoted(ctx):
    q = """select c.ck, c.name, c.bal, sum(o.price) s, count(*) n
           from orders o join cust c on o.ock = c.ck
           group by c.ck, c.name, c.bal order by c.ck"""
    assert agg_keys(ctx, q) == "['ck']"
    got = ctx.sql(q).to_pandas()
    cust, orders = ctx._pd
    exp = (orders.merge(cust, left_on="ock", right_on="ck")
           .groupby("ck", dropna=False)
           .agg(name=("name", "first"), bal=("bal", "first"),
                s=("price", "sum"), n=("price", "count"))
           .reset_index().sort_values("ck"))
    assert (got["ck"].to_numpy() == exp["ck"].to_numpy()).all()
    assert got["name"].fillna("~").tolist() == exp["name"].fillna("~").tolist()
    assert (got["bal"].to_numpy() == exp["bal"].to_numpy()).all()
    assert (got["s"].to_numpy() == exp["s"].to_numpy()).all()
    assert (got["n"].to_numpy() == exp["n"].to_numpy()).all()


def test_transitive_through_join(ctx):
    # ok unique in orders -> determines ock; ock = ck -> determines cust cols
    q = """select o.ok, o.price, c.name, count(*) n
           from orders o join cust c on o.ock = c.ck
           group by o.ok, o.price, c.name order by o.ok limit 5"""
    assert agg_keys(ctx, q) == "['ok']"
    got = ctx.sql(q).to_pandas()
    cust, orders = ctx._pd
    exp = (orders.merge(cust, left_on="ock", right_on="ck")
           .groupby("ok").agg(price=("price", "first"),
                              name=("name", "first"), n=("ck", "count"))
           .reset_index().sort_values("ok").head(5))
    assert (got["ok"].to_numpy() == exp["ok"].to_numpy()).all()
    assert (got["price"].to_numpy() == exp["price"].to_numpy()).all()
    assert got["name"].fillna("~").tolist() == exp["name"].fillna("~").tolist()


def test_no_unique_key_no_demotion(ctx):
    # price is not unique: grouping keys must be untouched
    q = "select price, ock, count(*) n from orders group by price, ock"
    assert agg_keys(ctx, q) == "['o.price', 'o.ock']" or \
        agg_keys(ctx, q) == "['price', 'ock']"
