"""Serial (out-of-core) runtime: partition-at-a-time execution with
host-RAM shuffles must match local single-program results row-exactly."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ballista_tpu.client import SessionContext


def _mk(serial):
    rng = np.random.default_rng(11)
    n = 4000
    orders = pa.table({
        "o_id": np.arange(n, dtype=np.int64),
        "cust": rng.integers(0, 200, n),
        "amount": rng.integers(1, 1000, n),
    })
    cust = pa.table({
        "c_id": np.arange(200, dtype=np.int64),
        "seg": rng.integers(0, 5, 200),
    })
    ctx = SessionContext(serial_partitions=4 if serial else None)
    ctx.register_arrow("orders", orders)
    ctx.register_arrow("cust", cust)
    return ctx


QUERIES = [
    "select cust, count(*) as c, sum(amount) as s from orders "
    "group by cust order by cust",
    "select c.seg, sum(o.amount) as s, count(*) as n from orders o "
    "join cust c on o.cust = c.c_id group by c.seg order by c.seg",
    "select o_id, amount from orders where amount > 900 "
    "order by amount desc, o_id limit 25",
    "select cust, amount, row_number() over "
    "(partition by cust order by amount desc, o_id) as rn "
    "from orders where cust < 10 order by cust, rn limit 40",
]


@pytest.mark.parametrize("qi", range(len(QUERIES)))
def test_serial_matches_local(qi):
    q = QUERIES[qi]
    local = _mk(False).sql(q).to_pandas()
    serial = _mk(True).sql(q).to_pandas()
    pd.testing.assert_frame_equal(serial.reset_index(drop=True),
                                  local.reset_index(drop=True),
                                  check_dtype=False)


def test_serial_distinct_union():
    q = ("select seg from cust union select cust - cust + 7 as seg "
         "from orders where cust = 3 order by seg")
    local = _mk(False).sql(q).to_pandas()
    serial = _mk(True).sql(q).to_pandas()
    pd.testing.assert_frame_equal(serial, local, check_dtype=False)


def test_serial_overflow_retry():
    # tiny quota headroom forces overflow; the retry driver must recover
    from ballista_tpu.scheduler.distributed_planner import DistOptions
    from ballista_tpu.scheduler.serial import execute_serial
    from ballista_tpu import batch as B

    ctx = _mk(False)
    plan = ctx.sql(QUERIES[1]).plan
    out, schema = execute_serial(
        ctx, plan, 4,
        options=DistOptions(n_partitions=4, quota_headroom=0.05))
    got = B.to_pandas(out, schema)
    exp = _mk(False).sql(QUERIES[1]).to_pandas()
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  exp.reset_index(drop=True),
                                  check_dtype=False)


def test_serial_one_compile_per_stage():
    """All partitions of a stage share one compiled program (pid rides as
    a traced scalar, so running P partitions never retraces)."""
    from ballista_tpu.scheduler.serial import SerialRuntime

    captured = []
    orig = SerialRuntime._compile_stage

    def spy(self, stage):
        out = orig(self, stage)
        captured.append(out[0])
        return out

    SerialRuntime._compile_stage = spy
    try:
        ctx = _mk(True)
        df = ctx.sql(QUERIES[0]).to_pandas()
    finally:
        SerialRuntime._compile_stage = orig
    assert len(df) == 200
    assert captured, "no stages compiled"
    for fn in captured:
        assert fn._cache_size() == 1, "stage retraced across partitions"
