"""Avro ingest (BallistaContext::read_avro parity, client/src/context.rs;
container format reader in ballista_tpu/avro.py)."""

import datetime

import pyarrow as pa
import pytest

from ballista_tpu.avro import read_avro, write_avro
from ballista_tpu.client import SessionContext


def sample_table():
    return pa.table({
        "id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "name": pa.array(["ann", "bob", None, "dee"], type=pa.string()),
        "score": pa.array([1.5, None, 3.25, 4.0], type=pa.float64()),
        "flag": pa.array([True, False, True, None], type=pa.bool_()),
        "day": pa.array([datetime.date(2024, 1, 1), None,
                         datetime.date(1969, 12, 31),
                         datetime.date(2024, 6, 15)], type=pa.date32()),
    })


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_roundtrip(tmp_path, codec):
    t = sample_table()
    path = str(tmp_path / "t.avro")
    write_avro(path, t, codec=codec)
    got = read_avro(path)
    assert got.equals(t)


def test_register_and_query(tmp_path):
    path = str(tmp_path / "t.avro")
    write_avro(path, sample_table())
    ctx = SessionContext()
    ctx.register_avro("t", path)
    df = ctx.sql("select count(*) as n, sum(id) as s from t where flag")
    row = df.to_pandas().iloc[0]
    assert row["n"] == 2 and row["s"] == 4  # ids 1 and 3 have flag=true

    df2 = ctx.read_avro(path).to_pandas()
    assert len(df2) == 4


def test_bad_magic(tmp_path):
    path = str(tmp_path / "bad.avro")
    with open(path, "wb") as fh:
        fh.write(b"nope" + b"\x00" * 32)
    with pytest.raises(ValueError, match="container"):
        read_avro(path)
