import io
import subprocess
import sys

import pytest

from ballista_tpu.config import (BALLISTA_SHUFFLE_PARTITIONS, BallistaConfig)


def test_config_defaults_and_validation():
    cfg = BallistaConfig()
    assert cfg.shuffle_partitions() == 16
    assert cfg.batch_size() == 8192
    cfg.set(BALLISTA_SHUFFLE_PARTITIONS, "8")
    assert cfg.shuffle_partitions() == 8
    with pytest.raises(KeyError):
        cfg.set("ballista.nope", "1")
    with pytest.raises(ValueError):
        cfg.set(BALLISTA_SHUFFLE_PARTITIONS, "eight")
    opts = cfg.to_dist_options()
    assert opts.n_partitions == 8


def test_cli_one_shot(tmp_path):
    out = subprocess.run(
        [sys.executable, "-m", "ballista_tpu.cli", "--sf", "0.001",
         "-c", "select count(*) as n from region", "--format", "csv"],
        capture_output=True, text=True, timeout=300,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": "/root/repo",
             "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_cache_cpu",
             "HOME": "/root"})
    assert out.returncode == 0, out.stderr[-2000:]
    assert "n" in out.stdout and "5" in out.stdout


class TestCapacityBucketing:
    def test_bucket_capacity_tiers(self):
        from ballista_tpu.batch import LANE, bucket_capacity, round_capacity
        # always >= n, lane-aligned, <= ~19% over the exact rounding
        for n in (1, 100, 128, 129, 1000, 5000, 6001215, 10**8):
            cap = bucket_capacity(n)
            assert cap >= n and cap % LANE == 0
            assert cap <= round_capacity(int(n * 1.2)) + LANE
        # monotone
        caps = [bucket_capacity(n) for n in range(1, 5000, 37)]
        assert caps == sorted(caps)
        # nearby sizes share one tier (the point: compiled-program reuse)
        assert bucket_capacity(5000) == bucket_capacity(5400)
        assert len({bucket_capacity(n) for n in range(1, 10**6, 997)}) < 40

    def test_bucketed_session_shares_shapes(self):
        import pyarrow as pa

        from ballista_tpu.client import SessionContext
        ctx = SessionContext(capacity_mode="bucket")
        ctx.register_arrow("a", pa.table({"x": list(range(5000))}))
        ctx.register_arrow("b", pa.table({"x": list(range(5400))}))
        assert ctx.tables["a"].capacity == ctx.tables["b"].capacity
        # results unaffected by padding
        df = ctx.sql("select count(*) as c, sum(x) as s from b").to_pandas()
        assert df["c"][0] == 5400 and df["s"][0] == 5400 * 5399 // 2

    def test_capacity_mode_validation(self):
        import pytest

        from ballista_tpu.client import SessionContext
        from ballista_tpu.config import BallistaConfig
        with pytest.raises(ValueError):
            SessionContext(capacity_mode="fuzzy")
        with pytest.raises(ValueError):
            BallistaConfig({"ballista.capacity.mode": "fuzzy"})
        cfg = BallistaConfig({"ballista.capacity.mode": "bucket"})
        assert cfg.capacity_mode() == "bucket"


def test_create_external_table_and_show(tmp_path):
    """DDL interception parity (context.rs:362): CREATE EXTERNAL TABLE,
    SHOW TABLES, SHOW COLUMNS / DESCRIBE run through SessionContext.sql."""
    from ballista_tpu.client import SessionContext

    csv = tmp_path / "people.csv"
    csv.write_text("id,name,score\n1,ann,2.5\n2,bob,1.0\n3,cat,9.5\n")
    raw = tmp_path / "raw.csv"
    raw.write_text("4,dee\n5,eli\n")

    ctx = SessionContext()
    ctx.sql(f"CREATE EXTERNAL TABLE people STORED AS CSV WITH HEADER ROW "
            f"LOCATION '{csv}'; SELECT 1 as ok")
    df = ctx.sql("select name from people where score > 2 order by id")
    assert list(df.to_pandas()["name"]) == ["ann", "cat"]

    # schema-supplied, headerless variant
    ctx.sql(f"CREATE EXTERNAL TABLE raw (id int, name varchar) "
            f"STORED AS CSV LOCATION '{raw}'; SELECT 1 as ok")
    assert list(ctx.sql("select id from raw").to_pandas()["id"]) == [4, 5]

    t = ctx.sql("SHOW TABLES").to_pandas()
    assert set(t["table_name"]) >= {"people", "raw"}
    assert set(t["table_type"]) == {"BASE TABLE"}

    c = ctx.sql("SHOW COLUMNS FROM people").to_pandas()
    assert list(c["column_name"]) == ["id", "name", "score"]
    d = ctx.sql("DESCRIBE raw").to_pandas()
    assert list(d["column_name"]) == ["id", "name"]
    assert list(d["data_type"]) == ["int32", "string"]
