"""Packed single-operand join paths must match the generic co-sort paths
exactly (nulls, dead rows, duplicates, left-outer)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ballista_tpu.ops.merge_join import (merge_probe_unique,
                                         merge_probe_unique_packed,
                                         tiny_probe_unique)
from ballista_tpu.ops.expand_join import expand_join


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(17)
    nb, npr = 256, 2048
    bk = rng.permutation(1000)[:nb].astype(np.int64) + 50  # unique keys
    bvalid = rng.random(nb) > 0.05
    blive = np.ones(nb, bool)
    blive[-30:] = False
    pk = rng.integers(0, 1100, npr).astype(np.int64) + 50
    pvalid = rng.random(npr) > 0.1
    plive = np.ones(npr, bool)
    plive[-100:] = False
    return (jnp.asarray(bk), jnp.asarray(bvalid), jnp.asarray(blive),
            jnp.asarray(pk), jnp.asarray(pvalid), jnp.asarray(plive))


def test_packed_merge_matches_generic(data):
    bk, bv, bl, pk, pv, pl = data
    generic = merge_probe_unique((bk,), (bv,), bl, (pk,), (pv,), pl)
    packed = merge_probe_unique_packed(bk, bv, bl, pk, pv, pl,
                                       lo=50, key_bits=12)
    assert np.array_equal(np.asarray(generic), np.asarray(packed))


def test_tiny_matches_generic(data):
    bk, bv, bl, pk, pv, pl = data
    generic = merge_probe_unique((bk,), (bv,), bl, (pk,), (pv,), pl)
    tiny = tiny_probe_unique((bk,), (bv,), bl, (pk,), (pv,), pl)
    assert np.array_equal(np.asarray(generic), np.asarray(tiny))


@pytest.mark.parametrize("left_outer", [False, True])
def test_packed_expand_matches_generic(left_outer):
    rng = np.random.default_rng(23)
    nb, npr = 512, 1024
    bk = jnp.asarray(rng.integers(0, 60, nb).astype(np.int64))  # dup keys
    bv = jnp.asarray(rng.random(nb) > 0.05)
    bl = jnp.asarray(np.arange(nb) < nb - 40)
    pk = jnp.asarray(rng.integers(0, 80, npr).astype(np.int64))
    pv = jnp.asarray(rng.random(npr) > 0.1)
    pl = jnp.asarray(np.arange(npr) < npr - 60)
    cap = 1 << 15
    g = expand_join((bk,), (bv,), bl, (pk,), (pv,), pl, 1024, cap,
                    left_outer=left_outer)
    p = expand_join((bk,), (bv,), bl, (pk,), (pv,), pl, 1024, cap,
                    left_outer=left_outer, lo=0, key_bits=8)
    assert int(g.total) == int(p.total)
    assert bool(g.overflow) == bool(p.overflow)
    # output slots must map the same (probe, build) multiset; order inside
    # a probe's matches may differ, so compare sorted pair lists
    def pairs(em):
        pr = np.asarray(em.probe_row)[np.asarray(em.valid)]
        br = np.asarray(em.build_row)[np.asarray(em.valid)]
        return sorted(zip(pr.tolist(), br.tolist()))
    assert pairs(g) == pairs(p)
    assert np.array_equal(np.asarray(g.build_matched),
                          np.asarray(p.build_matched))


def test_join_on_strings_with_different_dictionaries():
    """Join keys from two tables dictionary-encode against DIFFERENT
    dictionaries; codes must remap to a shared dictionary before
    comparing (regression: 'x' (code 0) used to match 'w' (code 0))."""
    import pandas as pd
    import pyarrow as pa
    from ballista_tpu.client import SessionContext

    ctx = SessionContext()
    ctx.register_arrow("a", pa.table({"k": ["x", "y", "z"], "va": [1, 2, 3]}))
    ctx.register_arrow("b", pa.table({"k": ["y", "z", "w"], "vb": [10, 20, 30]}))
    got = ctx.sql(
        "select a.k, va, vb from a join b on a.k = b.k order by a.k"
    ).to_pandas()
    assert got["k"].tolist() == ["y", "z"]
    assert got["vb"].tolist() == [10, 20]
    lo = ctx.sql(
        "select a.k, vb from a left join b on a.k = b.k order by a.k"
    ).to_pandas()
    assert lo["k"].tolist() == ["x", "y", "z"]
    assert pd.isna(lo["vb"].iloc[0]) and lo["vb"].iloc[1:].tolist() == [10, 20]
    anti = ctx.sql(
        "select k from a where k not in (select k from b) order by k"
    ).to_pandas()
    assert anti["k"].tolist() == ["x"]
