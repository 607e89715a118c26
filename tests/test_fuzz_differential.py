"""Randomized differential testing: generated join/group/order queries
over random tables (nulls, strings with per-table dictionaries, dup and
unique keys) must match pandas exactly. Deterministic seeds.

The string-key dictionary bug (codes compared across different
dictionaries) was invisible to the TPC-H suites — this harness covers
the cross-table surface the targeted tests miss."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ballista_tpu.client import SessionContext

WORDS = ["ash", "birch", "cedar", "dune", "elm", "fern", "gale", "hill",
         "iris", "jade", "kelp", "loam", "mist", "nook", "oak", "pine"]


def make_table(rng, n, names, key_hi):
    kn, sn, vn = names

    def maybe_null(arr, p=0.15):
        mask = rng.random(n) < p
        out = arr.astype(object)
        out[mask] = None
        return out

    vocab = WORDS[:int(rng.integers(4, 16))]
    return pd.DataFrame({
        kn: rng.integers(0, key_hi, n),
        sn: maybe_null(rng.choice(vocab, n)),
        vn: rng.integers(-1000, 1000, n),
    })


def run_case(seed):
    rng = np.random.default_rng(seed)
    na, nb = int(rng.integers(50, 400)), int(rng.integers(50, 400))
    key_hi = int(rng.integers(5, 60))
    a = make_table(rng, na, ("ak", "s_a", "av"), key_hi)
    b = make_table(rng, nb, ("bk", "s_b", "bv"), key_hi)
    on = str(rng.choice(["num", "str"]))
    how = str(rng.choice(["join", "left join"]))
    if rng.random() < 0.5:  # unique build half the time (merge fast path)
        bcol = "bk" if on == "num" else "s_b"
        b = b.drop_duplicates(bcol).reset_index(drop=True)
    ctx = SessionContext()
    ctx.register_arrow("a", pa.Table.from_pandas(a))
    ctx.register_arrow("b", pa.Table.from_pandas(b))
    join_cond = "a.ak = b.bk" if on == "num" else "a.s_a = b.s_b"
    lcol = "ak" if on == "num" else "s_a"
    rcol = "bk" if on == "num" else "s_b"
    pd_how = "inner" if how == "join" else "left"

    # pandas merge matches NaN keys to each other; SQL never does — give
    # null keys per-row sentinels that cannot match across sides
    am = a.assign(__jk=pd.Series(
        [v if pd.notna(v) else f"\0a{i}"
         for i, v in enumerate(a[lcol])], dtype=object)
        if on == "str" else a[lcol])
    bm = b.assign(__jk=pd.Series(
        [v if pd.notna(v) else f"\0b{i}"
         for i, v in enumerate(b[rcol])], dtype=object)
        if on == "str" else b[rcol])

    q = (f"select a.ak, s_a, av, s_b, bv from a {how} b on {join_cond} "
         f"order by a.ak, s_a, av, s_b, bv")
    got = ctx.sql(q).to_pandas()
    exp = am.merge(bm, on="__jk", how=pd_how)
    exp = exp[["ak", "s_a", "av", "s_b", "bv"]].sort_values(
        ["ak", "s_a", "av", "s_b", "bv"],
        na_position="last", kind="stable").reset_index(drop=True)
    assert len(got) == len(exp), (seed, q, len(got), len(exp))
    assert got["ak"].tolist() == exp["ak"].tolist(), (seed, q, "ak")
    assert got["av"].tolist() == exp["av"].tolist(), (seed, q, "av")
    for col in ("s_a", "s_b"):
        assert got[col].fillna("~").tolist() == \
            exp[col].fillna("~").tolist(), (seed, q, col)
    gb = got["bv"].astype("float64").fillna(1e18).tolist()
    eb = exp["bv"].astype("float64").fillna(1e18).tolist()
    assert gb == eb, (seed, q, "bv")

    # group-by over the join with aggregates
    q2 = (f"select s_a, count(*) n, sum(av) s, min(bv) mn "
          f"from a {how} b on {join_cond} group by s_a order by s_a")
    got2 = ctx.sql(q2).to_pandas()
    j = am.merge(bm, on="__jk", how=pd_how)
    exp2 = (j.groupby("s_a", dropna=False)
            .agg(n=("av", "size"), s=("av", "sum"), mn=("bv", "min"))
            .reset_index())
    exp2 = exp2.sort_values("s_a", na_position="last",
                            kind="stable").reset_index(drop=True)
    assert len(got2) == len(exp2), (seed, q2, len(got2), len(exp2))
    assert got2["s_a"].fillna("~").tolist() == \
        exp2["s_a"].fillna("~").tolist(), (seed, q2)
    assert got2["n"].tolist() == exp2["n"].tolist(), (seed, q2)
    assert got2["s"].tolist() == exp2["s"].tolist(), (seed, q2)
    gmn = got2["mn"].astype("float64").fillna(1e18).tolist()
    emn = exp2["mn"].astype("float64").fillna(1e18).tolist()
    assert gmn == emn, (seed, q2)


@pytest.mark.parametrize("seed", range(12))
def test_differential(seed):
    run_case(seed)


def run_semi_case(seed):
    rng = np.random.default_rng(1000 + seed)
    na, nb = int(rng.integers(50, 300)), int(rng.integers(50, 300))
    key_hi = int(rng.integers(5, 40))
    a = make_table(rng, na, ("ak", "s_a", "av"), key_hi)
    b = make_table(rng, nb, ("bk", "s_b", "bv"), key_hi)
    ctx = SessionContext()
    ctx.register_arrow("a", pa.Table.from_pandas(a))
    ctx.register_arrow("b", pa.Table.from_pandas(b))
    neg = bool(rng.random() < 0.5)
    op = "not in" if neg else "in"
    on = str(rng.choice(["num", "str"]))
    sub = "select bk from b" if on == "num" else "select s_b from b"
    col = "ak" if on == "num" else "s_a"
    q = (f"select ak, s_a, av from a where {col} {op} ({sub}) "
         f"order by ak, s_a, av")
    got = ctx.sql(q).to_pandas()
    keys = set(b["bk"]) if on == "num" else set(
        v for v in b["s_b"] if pd.notna(v))
    if neg:
        # NOT IN with NULLs in the subquery yields no rows at all (SQL)
        if on == "str" and b["s_b"].isna().any():
            keep = a[col].map(lambda v: False)
        else:
            keep = a[col].map(lambda v: pd.notna(v) and v not in keys)
    else:
        keep = a[col].map(lambda v: pd.notna(v) and v in keys)
    exp = a[keep].sort_values(["ak", "s_a", "av"], na_position="last",
                              kind="stable").reset_index(drop=True)
    assert len(got) == len(exp), (seed, q, len(got), len(exp))
    assert got["ak"].tolist() == exp["ak"].tolist(), (seed, q)
    assert got["s_a"].fillna("~").tolist() == \
        exp["s_a"].fillna("~").tolist(), (seed, q)


def run_multikey_case(seed):
    rng = np.random.default_rng(2000 + seed)
    na, nb = int(rng.integers(50, 300)), int(rng.integers(50, 300))
    a = pd.DataFrame({"k1": rng.integers(0, 8, na),
                      "k2": rng.integers(-4, 4, na),
                      "av": np.arange(na)})
    b = pd.DataFrame({"j1": rng.integers(0, 8, nb),
                      "j2": rng.integers(-4, 4, nb),
                      "bv": np.arange(nb)})
    if rng.random() < 0.5:
        b = b.drop_duplicates(["j1", "j2"]).reset_index(drop=True)
    ctx = SessionContext()
    ctx.register_arrow("a", pa.Table.from_pandas(a))
    ctx.register_arrow("b", pa.Table.from_pandas(b))
    q = ("select k1, k2, av, bv from a join b on a.k1 = b.j1 and "
         "a.k2 = b.j2 order by k1, k2, av, bv")
    got = ctx.sql(q).to_pandas()
    exp = a.merge(b, left_on=["k1", "k2"], right_on=["j1", "j2"])
    exp = exp[["k1", "k2", "av", "bv"]].sort_values(
        ["k1", "k2", "av", "bv"], kind="stable").reset_index(drop=True)
    assert got[["k1", "k2", "av", "bv"]].values.tolist() == \
        exp.values.tolist(), (seed, q, len(got), len(exp))


@pytest.mark.parametrize("seed", range(8))
def test_differential_semi_anti(seed):
    run_semi_case(seed)


@pytest.mark.parametrize("seed", range(8))
def test_differential_multikey(seed):
    run_multikey_case(seed)


def run_window_case(seed):
    rng = np.random.default_rng(3000 + seed)
    n = int(rng.integers(100, 600))
    df = pd.DataFrame({"g": rng.integers(0, 7, n),
                       "o": rng.integers(0, 50, n),
                       "v": rng.integers(-100, 100, n),
                       "r": np.arange(n)})  # unique tiebreaker
    ctx = SessionContext()
    ctx.register_arrow("t", pa.Table.from_pandas(df))
    q = ("select g, o, r, "
         "row_number() over (partition by g order by o, r) rn, "
         "rank() over (partition by g order by o) rk, "
         "sum(v) over (partition by g) tot "
         "from t order by g, o, r")
    got = ctx.sql(q).to_pandas()
    exp = df.sort_values(["g", "o", "r"], kind="stable").reset_index(drop=True)
    exp["rn"] = exp.groupby("g").cumcount() + 1
    exp["rk"] = exp.groupby("g")["o"].rank(method="min").astype(int)
    exp["tot"] = exp.groupby("g")["v"].transform("sum")
    for col in ("g", "o", "r", "rn", "rk", "tot"):
        assert got[col].tolist() == exp[col].tolist(), (seed, col)


@pytest.mark.parametrize("seed", range(6))
def test_differential_windows(seed):
    run_window_case(seed)


def test_correlated_not_in_nulls():
    """Correlated NOT IN: groups containing NULL drop every row; empty
    groups (incl. NULL outer corr keys) keep every row; NULL lhs never
    qualifies against a non-empty group."""
    import pyarrow as pa
    from ballista_tpu.client import SessionContext

    ctx = SessionContext()
    ctx.register_arrow("a", pa.table({"k": [1, 1, 2, 2, 3, 2, None],
                                      "x": [10, 99, 10, 20, 5, None, 1]}))
    ctx.register_arrow("b", pa.table({"bk": [1, 1, 2, 2],
                                      "y": [10, None, 10, 30]}))
    r = ctx.sql("select k, x from a where x not in "
                "(select y from b where b.bk = a.k) order by k, x"
                ).to_pandas()
    # k=1: NULL y in group -> dropped; k=2: 20 kept, 10 match, NULL lhs
    # dropped; k=3 + NULL k: empty groups -> kept
    assert r.fillna(-1).values.tolist() == [[2, 20], [3, 5], [-1, 1]], r


def test_correlated_not_in_residual_nulls():
    """Correlated NOT IN with a non-equi residual: the residual restricts
    the group before the three-valued rules apply (NULL in group drops
    the row; empty group keeps it; NULL lhs drops against non-empty)."""
    ctx = SessionContext()
    ctx.register_arrow("a", pa.table({
        "id": [1, 2, 3, 4, 5, 6, 7],
        "k":  [1, 1, 2, 2, 3, 2, None],
        "z":  [5, 5, 5, 5, 5, 5, 5],
        "x":  [10, 99, 10, 20, 5, None, 1]}))
    ctx.register_arrow("b", pa.table({
        "bk": [1, 1, 2, 2, 2],
        "w":  [0, 0, 0, 0, 9],
        "y":  [10, None, 10, 30, 77]}))
    r = ctx.sql("select k, x from a where x not in "
                "(select y from b where b.bk = a.k and b.w < a.z) "
                "order by k, x").to_pandas()
    # k=1 group {10,NULL}: NULL -> both rows dropped. k=2 group {10,30}
    # (w=9 row residual-excluded): x=10 matches, x=20 kept, NULL lhs
    # dropped. k=3 and NULL k: empty groups -> kept.
    assert r.fillna(-1).values.tolist() == [[2, 20], [3, 5], [-1, 1]], r
    # residual that references the subquery item column itself
    r2 = ctx.sql("select k, x from a where x not in "
                 "(select y from b where b.bk = a.k and y > a.z) "
                 "order by k, x").to_pandas()
    # y > z=5 drops NULL y and y<=5: k=1 group {10}; k=2 group {10,30,77}
    # -> k=1: x=10 match dropped, x=99 kept; k=2: x=10 match dropped,
    # x=20 kept, NULL lhs dropped; empty groups kept.
    assert r2.fillna(-1).values.tolist() == \
        [[1, 99], [2, 20], [3, 5], [-1, 1]], r2


def run_setop_case(seed):
    rng = np.random.default_rng(4000 + seed)
    na, nb = int(rng.integers(30, 200)), int(rng.integers(30, 200))
    a = make_table(rng, na, ("k", "s", "v"), 10)
    b = make_table(rng, nb, ("k", "s", "v"), 10)
    op = str(rng.choice(["intersect", "except"]))
    ctx = SessionContext()
    ctx.register_arrow("fa", pa.Table.from_pandas(a))
    ctx.register_arrow("fb", pa.Table.from_pandas(b))
    q = (f"select k, s from fa {op} select k, s from fb "
         f"order by k, s")
    got = ctx.sql(q).to_pandas()

    def rows(df):
        return {(int(r.k), None if pd.isna(r.s) else str(r.s))
                for r in df.itertuples()}
    la, lb = rows(a), rows(b)
    exp = sorted(la & lb if op == "intersect" else la - lb,
                 key=lambda t: (t[0], t[1] is None, t[1] or ""))
    assert len(got) == len(exp), (seed, op, len(got), len(exp))
    gl = list(zip(got["k"].tolist(),
                  [None if pd.isna(x) else str(x) for x in got["s"]]))
    assert gl == exp, (seed, op, gl[:5], exp[:5])


@pytest.mark.parametrize("seed", range(8))
def test_differential_setops(seed):
    run_setop_case(seed)
