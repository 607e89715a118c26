"""MaskedLayout and SortedLayout must agree with each other and numpy."""

import numpy as np
import jax.numpy as jnp
import pytest

from ballista_tpu.batch import Column
from ballista_tpu.ops import segagg
from ballista_tpu.ops.hash import _norm_keys


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    n = 2048
    keys = rng.integers(0, 13, n).astype(np.int64)
    kvalid = rng.random(n) > 0.1        # some NULL keys
    x = rng.integers(-1000, 1000, n).astype(np.int64)
    xvalid = rng.random(n) > 0.2
    live = np.zeros(n, dtype=bool)
    live[:1900] = True
    return keys, kvalid, x, xvalid, live


def np_expected(keys, kvalid, x, xvalid, live):
    out = {}
    for i in range(len(keys)):
        if not live[i]:
            continue
        k = keys[i] if kvalid[i] else None
        s = out.setdefault(k, [0, 0, None, None, 0])  # sum,count,min,max,n
        s[4] += 1
        if xvalid[i]:
            s[0] += x[i]
            s[1] += 1
            s[2] = x[i] if s[2] is None else min(s[2], x[i])
            s[3] = x[i] if s[3] is None else max(s[3], x[i])
    return out


def check_layout(layout, key_of_group, data):
    keys, kvalid, x, xvalid, live = data
    exp = np_expected(keys, kvalid, x, xvalid, live)
    xs, xsv = layout.sum(jnp.asarray(x), jnp.asarray(xvalid))
    xc, _ = layout.count(jnp.asarray(x), jnp.asarray(xvalid))
    xn, xnv = layout.count_star()
    xmin, minv = layout.min(jnp.asarray(x), jnp.asarray(xvalid))
    xmax, _ = layout.max(jnp.asarray(x), jnp.asarray(xvalid))
    got = {}
    for g in range(layout.T):
        k = key_of_group(g)
        if k is SKIP:
            continue
        got[k] = (int(xs[g]), int(xc[g]), int(xmin[g]) if bool(minv[g]) else None,
                  int(xmax[g]) if bool(minv[g]) else None, int(xn[g]))
    for k, s in exp.items():
        assert k in got, f"missing group {k}"
        assert got[k] == (s[0], s[1], s[2], s[3], s[4]), (k, got[k], s)


SKIP = object()


def test_masked_layout(data):
    keys, kvalid, x, xvalid, live = data
    col = Column(jnp.asarray(keys), jnp.asarray(kvalid))
    slot, T = segagg.direct_slots([col], [13], jnp.asarray(live))
    layout = segagg.MaskedLayout(slot, jnp.asarray(live), T)
    counts, _ = layout.count_star()

    def key_of(g):
        if int(counts[g]) == 0:
            return SKIP
        return g if g < 13 else None
    check_layout(layout, key_of, data)


def presorted_layout(keys, kvalid, live, T):
    """Sort on the host (as exec/plan.py does on-device via ops/vsort) and
    build the presorted layout; returns (layout, perm) with perm mapping
    sorted position -> original row."""
    norm = np.asarray(_norm_keys((jnp.asarray(keys),), (jnp.asarray(kvalid),))[0])
    DEAD = np.int64(2**62)
    skey = np.where(live, norm, DEAD)
    perm = np.argsort(skey, kind="stable")
    layout = segagg.layout_from_sorted_keys(
        [jnp.asarray(skey[perm])], jnp.asarray(live[perm]), T)
    return layout, perm


def test_sorted_layout(data):
    keys, kvalid, x, xvalid, live = data
    layout, perm = presorted_layout(keys, kvalid, live, 64)
    n_groups = int(layout.n_groups)
    src = perm[np.asarray(layout.run_start)]

    def key_of(g):
        if g >= n_groups:
            return SKIP
        r = src[g]
        return int(keys[r]) if kvalid[r] else None
    # presorted layout: aggregate inputs must arrive in sorted order too
    sdata = (keys[perm], kvalid[perm], x[perm], xvalid[perm], live[perm])
    check_layout(layout, key_of, sdata)


def test_sorted_layout_overflow_detection(data):
    keys, kvalid, x, xvalid, live = data
    layout, _ = presorted_layout(keys, kvalid, live, 4)
    assert int(layout.n_groups) > 4  # caller must treat as overflow


def test_matmul_agg_large_signed(monkeypatch):
    """MXU limb-matmul aggregation must be exact for large signed int64."""
    monkeypatch.setenv("BALLISTA_MATMUL_AGG", "1")
    rng = np.random.default_rng(2)
    n, T = 50_000, 13
    slot = rng.integers(0, T, n).astype(np.int32)
    live = rng.random(n) > 0.1
    vals = rng.integers(-2**52, 2**52, n).astype(np.int64)
    valid = rng.random(n) > 0.15
    lay = segagg.MaskedLayout(jnp.asarray(np.where(live, slot, T)),
                              jnp.asarray(live), T)
    s, _ = lay.sum(jnp.asarray(vals), jnp.asarray(valid))
    c, _ = lay.count(jnp.asarray(vals), jnp.asarray(valid))
    exp_s = np.zeros(T, np.int64)
    exp_c = np.zeros(T, np.int64)
    m = live & valid
    np.add.at(exp_s, slot[m], vals[m])
    np.add.at(exp_c, slot[m], 1)
    assert np.array_equal(np.asarray(s), exp_s)
    assert np.array_equal(np.asarray(c), exp_c)


def test_fused_sorted_aggregate_matches_old_path(monkeypatch):
    """BALLISTA_FUSED_AGG=1 forces the one-compaction path on CPU; its
    outputs must be identical to the take-based SortedLayout path across
    every fused kind, single AND two-phase (partial/final) modes."""
    import numpy as np
    import pandas as pd

    from ballista_tpu.client import SessionContext

    rng = np.random.default_rng(7)
    n = 30_000
    df = pd.DataFrame({
        "k": rng.integers(0, 9_000, n).astype(np.int64),
        "v": rng.integers(-500, 500, n).astype(np.int64),
        "w": rng.random(n),
        "s": rng.choice(list("abcdefg"), n),
    })
    df.loc[rng.choice(n, 500, replace=False), "v"] = None
    sql = ("select k, count(*) c, count(v) cv, sum(v) sv, min(w) mw, "
           "max(w) xw, avg(v) av, min(s) ms, stddev_samp(w) sd "
           "from t group by k order by k")

    results = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("BALLISTA_FUSED_AGG", flag)
        ctx = SessionContext()
        ctx.register_pandas("t", df)
        results[flag] = ctx.sql(sql).to_pandas()
        # two-phase through the distributed mesh runtime
        ctx2 = SessionContext(distributed=True)
        ctx2.register_pandas("t", df)
        results[flag + "d"] = ctx2.sql(sql).to_pandas()
    for a, b in (("0", "1"), ("0", "1d"), ("0", "0d")):
        ga, gb = results[a], results[b]
        assert list(ga.columns) == list(gb.columns)
        for col in ga.columns:
            va, vb = ga[col].to_numpy(), gb[col].to_numpy()
            if va.dtype.kind == "f":
                assert np.allclose(va, vb, equal_nan=True), (a, b, col)
            else:
                assert (pd.Series(va).fillna(-1) == pd.Series(vb).fillna(-1)).all(), (a, b, col)
