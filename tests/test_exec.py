from decimal import Decimal

import numpy as np
import pandas as pd
import pyarrow as pa

from ballista_tpu import batch as B
from ballista_tpu.exec import (AggExpr, CoalesceExec, FilterExec,
                               HashAggregateExec, HashJoinExec, InputLeaf,
                               LimitExec, ProjectExec, SortExec, compile_stage)
from ballista_tpu.exprs import Alias, BinOp, Col, Lit


def lineitem_like():
    return pa.table({
        "l_quantity": pa.array([Decimal(x) for x in
                                ["17.00", "36.00", "8.00", "28.00", "24.00", "32.00"]],
                               type=pa.decimal128(15, 2)),
        "l_extendedprice": pa.array([Decimal(x) for x in
                                     ["100.00", "200.00", "300.50", "400.00", "500.00", "600.00"]],
                                    type=pa.decimal128(15, 2)),
        "l_discount": pa.array([Decimal(x) for x in
                                ["0.04", "0.09", "0.10", "0.09", "0.10", "0.07"]],
                               type=pa.decimal128(15, 2)),
        "l_returnflag": pa.array(["N", "N", "A", "A", "R", "N"]),
        "l_shipdate": pa.array([10000, 10100, 10200, 10300, 10400, 10500],
                               type=pa.int32()).cast(pa.date32()),
    })


def test_filter_project_stage():
    b, schema = B.from_arrow(lineitem_like())
    leaf = InputLeaf("t", schema, b.capacity)
    filt = FilterExec(leaf, BinOp("<=", Col("l_quantity"), Lit(30)))
    proj = ProjectExec(filt, [
        Col("l_returnflag"),
        Alias(BinOp("*", Col("l_extendedprice"),
                    BinOp("-", Lit(1), Col("l_discount"))), "revenue"),
    ])
    fn, ids = compile_stage(proj)
    out = fn({"t": b})
    assert int(out.num_rows) == 4  # qty <= 30: rows 0,2,3,4
    df = B.to_pandas(out, proj.schema)
    assert list(df["l_returnflag"]) == ["N", "A", "A", "R"]
    # revenue = price * (1 - discount), exact decimal scale 4
    assert df["revenue"][0] == 96.0
    assert df["revenue"][1] == 270.45


def test_single_phase_aggregate():
    b, schema = B.from_arrow(lineitem_like())
    leaf = InputLeaf("t", schema, b.capacity)
    agg = HashAggregateExec(
        leaf, [Col("l_returnflag")],
        [AggExpr("sum", Col("l_quantity"), alias="sum_qty"),
         AggExpr("count_star", alias="cnt"),
         AggExpr("avg", Col("l_extendedprice"), alias="avg_price"),
         AggExpr("min", Col("l_discount"), alias="min_disc")],
        mode="single")
    srt = SortExec(agg, [(Col("l_returnflag"), True, None)])
    fn, _ = compile_stage(srt)
    out = fn({"t": b})
    df = B.to_pandas(out, srt.schema)
    assert list(df["l_returnflag"]) == ["A", "N", "R"]
    assert list(df["sum_qty"]) == [36.0, 85.0, 24.0]
    assert list(df["cnt"]) == [2, 3, 1]
    assert df["avg_price"][0] == 350.25
    assert df["min_disc"][1] == 0.04


def test_two_phase_aggregate():
    b, schema = B.from_arrow(lineitem_like())
    leaf = InputLeaf("t", schema, b.capacity)
    part = HashAggregateExec(
        leaf, [Col("l_returnflag")],
        [AggExpr("sum", Col("l_quantity"), alias="sum_qty"),
         AggExpr("avg", Col("l_extendedprice"), alias="avg_price")],
        mode="partial")
    # simulate shuffle: feed partial output into a final agg
    leaf2 = InputLeaf("p", part.schema, part.capacity)
    fin = HashAggregateExec(
        leaf2, [Col("l_returnflag")],
        [AggExpr("sum", Col("l_quantity"), alias="sum_qty"),
         AggExpr("avg", Col("l_extendedprice"), alias="avg_price")],
        mode="final")
    srt = SortExec(fin, [(Col("l_returnflag"), True, None)])
    f1, _ = compile_stage(part)
    f2, _ = compile_stage(srt)
    mid = f1({"t": b})
    out = f2({"p": mid})
    df = B.to_pandas(out, srt.schema)
    assert list(df["l_returnflag"]) == ["A", "N", "R"]
    assert list(df["sum_qty"]) == [36.0, 85.0, 24.0]
    assert df["avg_price"][0] == 350.25
    assert df["avg_price"][1] == 300.0


def test_hash_join_inner_and_left():
    orders = pa.table({
        "o_orderkey": pa.array([1, 2, 3], type=pa.int64()),
        "o_total": pa.array([10.0, 20.0, 30.0], type=pa.float32()),
    })
    items = pa.table({
        "i_orderkey": pa.array([1, 1, 2, 9], type=pa.int64()),
        "i_qty": pa.array([5, 6, 7, 8], type=pa.int64()),
    })
    ob, oschema = B.from_arrow(orders)
    ib, ischema = B.from_arrow(items)
    oleaf = InputLeaf("o", oschema, ob.capacity)
    ileaf = InputLeaf("i", ischema, ib.capacity)

    inner = HashJoinExec(oleaf, ileaf, [("o_orderkey", "i_orderkey")], "inner")
    fn, _ = compile_stage(inner)
    out = fn({"o": ob, "i": ib})
    df = B.to_pandas(out, inner.schema).sort_values(["i_qty"]).reset_index(drop=True)
    assert len(df) == 3
    assert list(df["o_orderkey"]) == [1, 1, 2]
    assert list(df["i_qty"]) == [5, 6, 7]

    left = HashJoinExec(oleaf, ileaf, [("o_orderkey", "i_orderkey")], "left_outer")
    fn2, _ = compile_stage(left)
    out2 = fn2({"o": ob, "i": ib})
    df2 = B.to_pandas(out2, left.schema)
    assert len(df2) == 4
    # unmatched probe row (i_orderkey=9) has null build cols
    row = df2[df2["i_orderkey"] == 9].iloc[0]
    assert pd.isna(row["o_total"])

    semi = HashJoinExec(oleaf, ileaf, [("o_orderkey", "i_orderkey")], "semi")
    fn3, _ = compile_stage(semi)
    out3 = fn3({"o": ob, "i": ib})
    assert int(out3.num_rows) == 3

    anti = HashJoinExec(oleaf, ileaf, [("o_orderkey", "i_orderkey")], "anti")
    fn4, _ = compile_stage(anti)
    out4 = fn4({"o": ob, "i": ib})
    df4 = B.to_pandas(out4, anti.schema)
    assert list(df4["i_orderkey"]) == [9]


def test_coalesce_and_limit():
    t1 = pa.table({"x": pa.array([1, 2, 3], type=pa.int64())})
    t2 = pa.table({"x": pa.array([4, 5], type=pa.int64())})
    b1, s1 = B.from_arrow(t1)
    b2, s2 = B.from_arrow(t2)
    l1 = InputLeaf("a", s1, b1.capacity)
    l2 = InputLeaf("b", s2, b2.capacity)
    co = CoalesceExec([l1, l2])
    srt = SortExec(co, [(Col("x"), False, None)])
    lim = LimitExec(srt, 3)
    fn, _ = compile_stage(lim)
    out = fn({"a": b1, "b": b2})
    df = B.to_pandas(out, lim.schema)
    assert list(df["x"]) == [5, 4, 3]


def test_expanding_join_duplicates():
    orders = pa.table({
        "o_custkey": pa.array([1, 1, 2, 2, 2, 4], type=pa.int64()),
        "o_id": pa.array([10, 11, 12, 13, 14, 15], type=pa.int64()),
    })
    cust = pa.table({
        "c_custkey": pa.array([1, 2, 3], type=pa.int64()),
        "c_name": pa.array(["a", "b", "c"]),
    })
    ob, oschema = B.from_arrow(orders)
    cb, cschema = B.from_arrow(cust)
    oleaf = InputLeaf("o", oschema, ob.capacity)
    cleaf = InputLeaf("c", cschema, cb.capacity)

    # inner expanding: build=orders (dup custkeys), probe=customer
    inner = HashJoinExec(oleaf, cleaf, [("o_custkey", "c_custkey")], "inner",
                         unique_build=False)
    fn, _ = compile_stage(inner)
    out = fn({"o": ob, "c": cb})
    df = B.to_pandas(out, inner.schema).sort_values("o_id").reset_index(drop=True)
    assert len(df) == 5
    assert list(df["o_id"]) == [10, 11, 12, 13, 14]
    assert list(df["c_name"]) == ["a", "a", "b", "b", "b"]

    # left outer expanding: customer 3 (no orders) kept with null build cols
    left = HashJoinExec(oleaf, cleaf, [("o_custkey", "c_custkey")], "left_outer",
                        unique_build=False)
    fn2, _ = compile_stage(left)
    out2 = fn2({"o": ob, "c": cb})
    df2 = B.to_pandas(out2, left.schema)
    assert len(df2) == 6
    row = df2[df2["c_custkey"] == 3]
    assert len(row) == 1 and pd.isna(row["o_id"].iloc[0])


def test_expanding_join_overflow_flag():
    import jax.numpy as jnp
    t1 = pa.table({"k": pa.array([1] * 50, type=pa.int64())})
    t2 = pa.table({"j": pa.array([1] * 50, type=pa.int64())})
    b1, s1 = B.from_arrow(t1)
    b2, s2 = B.from_arrow(t2)
    l1 = InputLeaf("a", s1, b1.capacity)
    l2 = InputLeaf("b", s2, b2.capacity)
    # 50x50 = 2500 output rows > capacity 256 -> overflow flag
    j = HashJoinExec(l1, l2, [("k", "j")], "inner", unique_build=False,
                     out_capacity=256)
    fn, _ = compile_stage(j, with_overflow=True)
    out, overflow = fn({"a": b1, "b": b2})
    assert bool(overflow)
