"""Host-level out-of-core scan plane: ParquetDatasetProvider + the serial
runtime stream chunked parquet part files range-by-range, never
materializing a full table in host RAM — the SF100 execution path
(datagen --chunks writes the data; this reads it)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from ballista_tpu import batch as B
from ballista_tpu.client import SessionContext
from ballista_tpu.client.context import ParquetDatasetProvider
from ballista_tpu.datagen.tpch import TPCH_TABLES, generate_tpch_parquet
from ballista_tpu.scheduler.serial import execute_serial

SF = 0.01


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tpch_chunks")
    generate_tpch_parquet(SF, str(d), n_chunks=3,
                          tables=["orders", "customer", "lineitem"])
    return d


def test_metadata_without_materialization(dataset_dir):
    tp = ParquetDatasetProvider("orders", str(dataset_dir / "orders"),
                                TPCH_TABLES["orders"][1])
    assert tp.num_rows == TPCH_TABLES["orders"][0](SF)
    assert tp._materialized is None
    names = [f.name for f in tp._field_list()]
    assert "o_orderkey" in names and "o_comment" in names
    assert tp._materialized is None  # schema came from parquet metadata


def test_range_table_reads_only_overlap(dataset_dir):
    tp = ParquetDatasetProvider("orders", str(dataset_dir / "orders"),
                                TPCH_TABLES["orders"][1])
    full = pq.read_table(str(dataset_dir / "orders"))
    lo, hi = tp.num_rows // 3 - 5, tp.num_rows // 3 + 7  # crosses a part
    got = tp.range_table(lo, hi, columns=["o_orderkey"])
    assert got.num_rows == hi - lo
    assert got["o_orderkey"].to_pylist() == \
        full["o_orderkey"].to_pylist()[lo:hi]
    assert tp._materialized is None


def test_streaming_dictionaries_match_global(dataset_dir):
    from ballista_tpu.batch import compute_dictionaries
    tp = ParquetDatasetProvider("customer", str(dataset_dir / "customer"),
                                TPCH_TABLES["customer"][1])
    stream = tp.dataset_dictionaries(["c_mktsegment"])
    full = compute_dictionaries(
        pq.read_table(str(dataset_dir / "customer"),
                      columns=["c_mktsegment"]))
    assert list(stream["c_mktsegment"]) == list(full["c_mktsegment"])


def test_serial_query_over_dataset_matches_oracle(dataset_dir):
    ctx = SessionContext()
    for name in ("orders", "customer"):
        ctx.register_parquet_dataset(name, str(dataset_dir / name),
                                     TPCH_TABLES[name][1])
    plan = ctx.sql(
        "select o_orderpriority, count(*) n, sum(o_totalprice) s "
        "from orders join customer on o_custkey = c_custkey "
        "where o_totalprice > 1000 "
        "group by o_orderpriority order by o_orderpriority").plan
    out, schema = execute_serial(ctx, plan, 4)
    got = B.to_pandas(out, schema)

    o = pq.read_table(str(dataset_dir / "orders")).to_pandas()
    c = pq.read_table(str(dataset_dir / "customer")).to_pandas()
    m = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    m = m[m.o_totalprice.astype(float) > 1000]
    exp = (m.groupby("o_orderpriority")
            .agg(n=("o_orderkey", "size"), s=("o_totalprice", "sum"))
            .reset_index().sort_values("o_orderpriority"))
    assert list(got["o_orderpriority"]) == list(exp["o_orderpriority"])
    assert [int(x) for x in got["n"]] == [int(x) for x in exp["n"]]
    assert np.allclose([float(x) for x in got["s"]],
                       [float(x) for x in exp["s"]])
    # the load-bearing claim: the serial scan never materialized a table
    for name in ("orders", "customer"):
        assert ctx.tables[name]._materialized is None


def test_serial_string_groupby_over_dataset(dataset_dir):
    """Dictionary-coded string keys work when dictionaries were computed
    by the per-part-file stream (codes must agree across partitions)."""
    ctx = SessionContext()
    ctx.register_parquet_dataset("orders", str(dataset_dir / "orders"),
                                 TPCH_TABLES["orders"][1])
    plan = ctx.sql(
        "select o_orderpriority, min(o_clerk) mc, max(o_clerk) xc, "
        "count(*) n from orders group by o_orderpriority "
        "order by o_orderpriority").plan
    out, schema = execute_serial(ctx, plan, 3)
    got = B.to_pandas(out, schema)
    o = pq.read_table(str(dataset_dir / "orders")).to_pandas()
    exp = (o.groupby("o_orderpriority")
            .agg(mc=("o_clerk", "min"), xc=("o_clerk", "max"),
                 n=("o_clerk", "size"))
            .reset_index().sort_values("o_orderpriority"))
    assert list(got["o_orderpriority"]) == list(exp["o_orderpriority"])
    assert list(got["mc"]) == list(exp["mc"])
    assert list(got["xc"]) == list(exp["xc"])
    assert [int(x) for x in got["n"]] == [int(x) for x in exp["n"]]


def test_serial_overflow_retry_over_dataset(dataset_dir):
    """Quota overflow inside the out-of-core runtime re-plans and
    re-streams the dataset with escalated capacities."""
    from ballista_tpu.scheduler.distributed_planner import DistOptions

    ctx = SessionContext()
    for name in ("orders", "customer"):
        ctx.register_parquet_dataset(name, str(dataset_dir / name),
                                     TPCH_TABLES[name][1])
    plan = ctx.sql(
        "select c_nationkey, count(*) n from orders "
        "join customer on o_custkey = c_custkey "
        "group by c_nationkey order by c_nationkey").plan
    out, schema = execute_serial(
        ctx, plan, 4,
        options=DistOptions(n_partitions=4, broadcast_threshold=0,
                            min_quota=8, quota_headroom=0.05))
    got = B.to_pandas(out, schema)
    o = pq.read_table(str(dataset_dir / "orders")).to_pandas()
    c = pq.read_table(str(dataset_dir / "customer")).to_pandas()
    m = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    exp = (m.groupby("c_nationkey").size().reset_index(name="n")
            .sort_values("c_nationkey"))
    assert [int(x) for x in got["n"]] == [int(x) for x in exp["n"]]


def test_rpc_executor_can_mount_parquet_dataset(dataset_dir):
    """The wire data-env spec reaches the out-of-core provider (executors
    on other hosts mount the same shared part-file directory)."""
    from ballista_tpu.serde.tasks import build_context
    ctx = build_context({"kind": "files", "tables": {
        "orders": {"format": "parquet_dataset",
                   "path": str(dataset_dir / "orders"),
                   "primary_key": ["o_orderkey"]}}})
    assert isinstance(ctx.tables["orders"], ParquetDatasetProvider)
    df = ctx.sql("select count(*) n from orders").to_pandas()
    assert int(df["n"][0]) == TPCH_TABLES["orders"][0](SF)
