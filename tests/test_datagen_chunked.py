"""Chunked datagen (the SF100 path): independently-generated chunks are
deterministic, key-consistent across tables, and a query over the chunked
data matches the pandas oracle on the same rows."""

import numpy as np
import pyarrow as pa
import pytest

from ballista_tpu.datagen.tpch import (TPCH_TABLES, chunk_ranges,
                                       generate_table, generate_table_chunks,
                                       generate_tpch_parquet)

SF = 0.01


def _concat(name, n_chunks):
    return pa.concat_tables(
        t for _, t in generate_table_chunks(name, SF, n_chunks))


def test_chunk_row_counts_and_keys():
    for name in ("customer", "orders", "supplier", "part"):
        t = _concat(name, 4)
        assert t.num_rows == TPCH_TABLES[name][0](SF)
        pk = TPCH_TABLES[name][1][0]
        keys = np.asarray(t[pk])
        assert len(np.unique(keys)) == len(keys)  # chunk ranges disjoint
    ps = _concat("partsupp", 4)
    assert ps.num_rows == 4 * TPCH_TABLES["part"][0](SF)


def test_chunks_are_deterministic_and_independent():
    """Chunk 2 built alone is byte-identical to chunk 2 built in sequence
    (any process can build any chunk)."""
    ranges = chunk_ranges("orders", SF, 4)
    seq = dict(generate_table_chunks("orders", SF, 4))
    lo, hi = ranges[2]
    from ballista_tpu.datagen.tpch import _chunk_rng
    alone = generate_table("orders", SF, 19940101, lo, hi,
                           rng=_chunk_rng("orders", 19940101, lo, hi))
    assert alone.equals(seq[2])


def test_lineitem_chunks_consistent_with_orders_chunks():
    orders = _concat("orders", 3)
    lineitem = _concat("lineitem", 3)
    okeys = set(np.asarray(orders["o_orderkey"]).tolist())
    lkeys = set(np.asarray(lineitem["l_orderkey"]).tolist())
    assert lkeys <= okeys          # every lineitem has its order
    assert len(lkeys) == len(okeys)  # every order has >=1 lineitem


def test_chunked_parquet_query_matches_oracle(tmp_path):
    import pyarrow.parquet as pq

    from ballista_tpu import batch as B
    from ballista_tpu.client import SessionContext

    counts = generate_tpch_parquet(SF, str(tmp_path), n_chunks=3,
                                   tables=["orders", "customer"])
    assert counts["orders"] == TPCH_TABLES["orders"][0](SF)
    ctx = SessionContext()
    for name in ("orders", "customer"):
        t = pq.read_table(str(tmp_path / name))
        ctx.register_arrow(name, t, primary_key=TPCH_TABLES[name][1])
    got = ctx.sql(
        "select o_orderpriority, count(*) n from orders join customer "
        "on o_custkey = c_custkey where o_totalprice > 1000 "
        "group by o_orderpriority order by o_orderpriority").to_pandas()
    o = pq.read_table(str(tmp_path / "orders")).to_pandas()
    c = pq.read_table(str(tmp_path / "customer")).to_pandas()
    m = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    m = m[m.o_totalprice.astype(float) > 1000]
    exp = (m.groupby("o_orderpriority").size().reset_index(name="n")
            .sort_values("o_orderpriority"))
    assert list(got["o_orderpriority"]) == list(exp["o_orderpriority"])
    assert [int(x) for x in got["n"]] == [int(x) for x in exp["n"]]


def test_whole_table_stream_unchanged():
    """The default (unchunked) stream must stay byte-stable: committed
    answer fixtures (answers/sf1) depend on it."""
    t1 = generate_table("orders", SF)
    t2 = generate_table("orders", SF)
    assert t1.equals(t2)
    # spot invariants the fixture generation relied on
    keys = np.asarray(t1["o_orderkey"])
    assert keys[0] == 1 and t1.num_rows == TPCH_TABLES["orders"][0](SF)
