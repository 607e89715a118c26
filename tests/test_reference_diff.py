"""Reference-diff gate: dbgen-format .tbl ingest + exact answer diffing.

Reference parity: `tpch.rs --expected-results` (benchmarks/src/bin/
tpch.rs:421-422,1027) — results diff EXACTLY against answers/q{n}.out
files; decimals have NO float tolerance. The .tbl reader accepts real
dbgen output unchanged (same '|'-delimited trailing-'|' format); CI
exercises the whole gate with the deterministic datagen's .tbl export
and oracle-captured answers (dbgen itself needs dists.dss, unavailable
offline — see datagen/tbl.py docstring).
"""

import os
import subprocess
import sys

import pytest

from ballista_tpu.client import SessionContext
from ballista_tpu.datagen.tbl import (diff_expected, read_tbl,
                                      register_tpch_tbl, tpch_schema,
                                      write_answers)

SF = 0.01
QUERIES = (1, 3, 6, 12, 14, 19)   # CI subset at SF0.01; scripts/reference_diff.sh runs all 22 at SF1


@pytest.fixture(scope="module")
def tbl_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("tpch_tbl"))
    subprocess.run(
        [sys.executable, "-m", "ballista_tpu.datagen", "--sf", str(SF),
         "--format", "tbl", "--out", out],
        check=True, env={**os.environ, "JAX_PLATFORMS": "cpu"})
    return out


@pytest.fixture(scope="module")
def answers_dir(tmp_path_factory):
    from ballista_tpu.benchmarks.oracle import to_pd
    from ballista_tpu.datagen import generate_tpch
    out = str(tmp_path_factory.mktemp("tpch_expected"))
    write_answers(to_pd(generate_tpch(SF)), out, QUERIES)
    return out


def test_tbl_roundtrip_schema(tbl_dir):
    """A .tbl file reads back with the exact TPC-H schema and row-exact
    values vs the native datagen."""
    from ballista_tpu.datagen import generate_tpch
    t = read_tbl(os.path.join(tbl_dir, "lineitem.tbl"), "lineitem")
    ref = generate_tpch(SF)["lineitem"]
    assert t.schema.equals(tpch_schema("lineitem"))
    assert t.num_rows == ref.num_rows
    assert t.column("l_orderkey").to_pylist() == \
        ref.column("l_orderkey").to_pylist()
    # decimals survive the text round-trip exactly
    assert t.column("l_extendedprice").to_pylist() == \
        ref.column("l_extendedprice").to_pylist()


def test_engine_matches_expected_answers(tbl_dir, answers_dir):
    """End-to-end gate: ingest .tbl (dbgen format), run queries, diff
    EXACTLY against the captured answer files."""
    from ballista_tpu.benchmarks.queries import TPCH_QUERIES
    ctx = SessionContext()
    register_tpch_tbl(ctx, tbl_dir)
    for q in QUERIES:
        got = ctx.sql(TPCH_QUERIES[q]).to_pandas()
        mismatch = diff_expected(got, answers_dir, q)
        assert mismatch is None, mismatch


def test_diff_catches_wrong_value(tbl_dir, answers_dir):
    """The gate actually fails on a wrong decimal (no silent tolerance)."""
    from ballista_tpu.benchmarks.queries import TPCH_QUERIES
    ctx = SessionContext()
    register_tpch_tbl(ctx, tbl_dir)
    got = ctx.sql(TPCH_QUERIES[6]).to_pandas()
    v = got.iloc[0, 0]
    got.iloc[0, 0] = v + type(v)("0.01")
    assert diff_expected(got, answers_dir, 6) is not None
