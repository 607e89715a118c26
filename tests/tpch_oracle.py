"""Pandas reference implementations of TPC-H queries — the row-exact oracle
the engine is diffed against (the reference repo diffs against expected
results the same way, `tpch.rs --expected-results`)."""

import numpy as np
import pandas as pd


def to_pd(tables):
    """pyarrow tables -> pandas with decimals as float64, dates as datetime."""
    out = {}
    for name, t in tables.items():
        df = t.to_pandas()
        for col in df.columns:
            if df[col].dtype == object and len(df):
                tn = type(df[col].iloc[0]).__name__
                if tn == "Decimal":
                    df[col] = df[col].astype(float)
                elif tn == "date":
                    df[col] = pd.to_datetime(df[col])
        out[name] = df
    return out


def q1(t):
    li = t["lineitem"]
    f = li[li["l_shipdate"] <= pd.Timestamp("1998-09-02")].copy()
    f["disc_price"] = f["l_extendedprice"] * (1 - f["l_discount"])
    f["charge"] = f["disc_price"] * (1 + f["l_tax"])
    g = f.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
        sum_qty=("l_quantity", "sum"),
        sum_base_price=("l_extendedprice", "sum"),
        sum_disc_price=("disc_price", "sum"),
        sum_charge=("charge", "sum"),
        avg_qty=("l_quantity", "mean"),
        avg_price=("l_extendedprice", "mean"),
        avg_disc=("l_discount", "mean"),
        count_order=("l_quantity", "size"),
    )
    return g.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def q3(t):
    c = t["customer"]; o = t["orders"]; li = t["lineitem"]
    c = c[c["c_mktsegment"] == "BUILDING"]
    o = o[o["o_orderdate"] < pd.Timestamp("1995-03-15")]
    li = li[li["l_shipdate"] > pd.Timestamp("1995-03-15")].copy()
    m = li.merge(o, left_on="l_orderkey", right_on="o_orderkey") \
          .merge(c, left_on="o_custkey", right_on="c_custkey")
    m["revenue"] = m["l_extendedprice"] * (1 - m["l_discount"])
    g = m.groupby(["l_orderkey", "o_orderdate", "o_shippriority"], as_index=False) \
         .agg(revenue=("revenue", "sum"))
    g = g[["l_orderkey", "revenue", "o_orderdate", "o_shippriority"]]
    return g.sort_values(["revenue", "o_orderdate"],
                         ascending=[False, True]).head(10).reset_index(drop=True)


def q4(t):
    o = t["orders"]; li = t["lineitem"]
    o = o[(o["o_orderdate"] >= pd.Timestamp("1993-07-01")) &
          (o["o_orderdate"] < pd.Timestamp("1993-10-01"))]
    lk = li[li["l_commitdate"] < li["l_receiptdate"]]["l_orderkey"].unique()
    o = o[o["o_orderkey"].isin(lk)]
    g = o.groupby("o_orderpriority", as_index=False).agg(
        order_count=("o_orderkey", "size"))
    return g.sort_values("o_orderpriority").reset_index(drop=True)


def q5(t):
    m = t["customer"].merge(t["orders"], left_on="c_custkey", right_on="o_custkey")
    m = m.merge(t["lineitem"], left_on="o_orderkey", right_on="l_orderkey")
    m = m.merge(t["supplier"], left_on="l_suppkey", right_on="s_suppkey")
    m = m[m["c_nationkey"] == m["s_nationkey"]]
    m = m.merge(t["nation"], left_on="s_nationkey", right_on="n_nationkey")
    m = m.merge(t["region"], left_on="n_regionkey", right_on="r_regionkey")
    m = m[(m["r_name"] == "ASIA") &
          (m["o_orderdate"] >= pd.Timestamp("1994-01-01")) &
          (m["o_orderdate"] < pd.Timestamp("1995-01-01"))].copy()
    m["revenue"] = m["l_extendedprice"] * (1 - m["l_discount"])
    g = m.groupby("n_name", as_index=False).agg(revenue=("revenue", "sum"))
    return g.sort_values("revenue", ascending=False).reset_index(drop=True)


def q6(t):
    li = t["lineitem"]
    f = li[(li["l_shipdate"] >= pd.Timestamp("1994-01-01")) &
           (li["l_shipdate"] < pd.Timestamp("1995-01-01")) &
           (li["l_discount"] >= 0.05) & (li["l_discount"] <= 0.07) &
           (li["l_quantity"] < 24)]
    return pd.DataFrame({"revenue": [(f["l_extendedprice"] * f["l_discount"]).sum()]})


def q10(t):
    o = t["orders"]
    o = o[(o["o_orderdate"] >= pd.Timestamp("1993-10-01")) &
          (o["o_orderdate"] < pd.Timestamp("1994-01-01"))]
    li = t["lineitem"]
    li = li[li["l_returnflag"] == "R"]
    m = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    m = m.merge(t["customer"], left_on="o_custkey", right_on="c_custkey")
    m = m.merge(t["nation"], left_on="c_nationkey", right_on="n_nationkey").copy()
    m["revenue"] = m["l_extendedprice"] * (1 - m["l_discount"])
    g = m.groupby(["c_custkey", "c_name", "c_acctbal", "c_phone", "n_name",
                   "c_address", "c_comment"], as_index=False).agg(
        revenue=("revenue", "sum"))
    g = g[["c_custkey", "c_name", "revenue", "c_acctbal", "n_name",
           "c_address", "c_phone", "c_comment"]]
    return g.sort_values("revenue", ascending=False).head(20).reset_index(drop=True)


def q12(t):
    li = t["lineitem"]
    li = li[li["l_shipmode"].isin(["MAIL", "SHIP"]) &
            (li["l_commitdate"] < li["l_receiptdate"]) &
            (li["l_shipdate"] < li["l_commitdate"]) &
            (li["l_receiptdate"] >= pd.Timestamp("1994-01-01")) &
            (li["l_receiptdate"] < pd.Timestamp("1995-01-01"))]
    m = li.merge(t["orders"], left_on="l_orderkey", right_on="o_orderkey").copy()
    high = m["o_orderpriority"].isin(["1-URGENT", "2-HIGH"])
    m["high_line_count"] = np.where(high, 1, 0)
    m["low_line_count"] = np.where(~high, 1, 0)
    g = m.groupby("l_shipmode", as_index=False).agg(
        high_line_count=("high_line_count", "sum"),
        low_line_count=("low_line_count", "sum"))
    return g.sort_values("l_shipmode").reset_index(drop=True)


def q14(t):
    li = t["lineitem"]
    li = li[(li["l_shipdate"] >= pd.Timestamp("1995-09-01")) &
            (li["l_shipdate"] < pd.Timestamp("1995-10-01"))]
    m = li.merge(t["part"], left_on="l_partkey", right_on="p_partkey").copy()
    m["rev"] = m["l_extendedprice"] * (1 - m["l_discount"])
    promo = m[m["p_type"].str.startswith("PROMO")]["rev"].sum()
    total = m["rev"].sum()
    # SQL: SUM over zero rows is NULL; x/NULL is NULL
    val = 100.0 * promo / total if len(m) and total != 0 else np.nan
    return pd.DataFrame({"promo_revenue": [val]})


def q19(t):
    m = t["lineitem"].merge(t["part"], left_on="l_partkey", right_on="p_partkey")
    c1 = ((m["p_brand"] == "Brand#12") &
          m["p_container"].isin(["SM CASE", "SM BOX", "SM PACK", "SM PKG"]) &
          (m["l_quantity"] >= 1) & (m["l_quantity"] <= 11) &
          (m["p_size"] >= 1) & (m["p_size"] <= 5))
    c2 = ((m["p_brand"] == "Brand#23") &
          m["p_container"].isin(["MED BAG", "MED BOX", "MED PKG", "MED PACK"]) &
          (m["l_quantity"] >= 10) & (m["l_quantity"] <= 20) &
          (m["p_size"] >= 1) & (m["p_size"] <= 10))
    c3 = ((m["p_brand"] == "Brand#34") &
          m["p_container"].isin(["LG CASE", "LG BOX", "LG PACK", "LG PKG"]) &
          (m["l_quantity"] >= 20) & (m["l_quantity"] <= 30) &
          (m["p_size"] >= 1) & (m["p_size"] <= 15))
    common = (m["l_shipmode"].isin(["AIR", "AIR REG"]) &
              (m["l_shipinstruct"] == "DELIVER IN PERSON"))
    f = m[common & (c1 | c2 | c3)]
    # SQL: SUM over zero rows is NULL
    val = (f["l_extendedprice"] * (1 - f["l_discount"])).sum() if len(f) else np.nan
    return pd.DataFrame({"revenue": [val]})


ORACLES = {1: q1, 3: q3, 4: q4, 5: q5, 6: q6, 10: q10, 12: q12, 14: q14, 19: q19}
