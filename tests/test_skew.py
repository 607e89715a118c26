"""Skewed-key splitting: salted shuffle joins + overflow-retry escalation.

Reference parity: SURVEY.md §2.5 flags skew detection/key splitting as the
TPU equivalent of Ballista's PartitionStats-driven handling; here the
overflow signal IS the detector and the retry driver escalates
quota -> salt (probe rows of a hot key spread over S shards, build rows
replicated to those S shards)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import jax

from ballista_tpu import batch as B
from ballista_tpu.client import SessionContext
from ballista_tpu.parallel.mesh import make_mesh
from ballista_tpu.scheduler.distributed_planner import DistOptions
from ballista_tpu.scheduler.runtime import execute_distributed


@pytest.fixture(scope="module")
def env():
    assert len(jax.devices()) >= 8
    rng = np.random.default_rng(0)
    n = 4000
    keys = np.where(rng.random(n) < 0.85, 7, rng.integers(0, 100, n))
    fact = pa.table({"k": pa.array(keys, pa.int64()),
                     "v": pa.array(rng.integers(0, 1000, n), pa.int64())})
    dim = pa.table({"dk": pa.array(np.arange(100), pa.int64()),
                    "w": pa.array(np.arange(100) * 10, pa.int64())})
    ctx = SessionContext()
    ctx.register_arrow("fact", fact, primary_key=None)
    ctx.register_arrow("dim", dim, primary_key=("dk",))
    return ctx, fact.to_pandas(), dim.to_pandas(), make_mesh(8)


def _expected(f, d):
    m = f.merge(d, left_on="k", right_on="dk")
    return (m.assign(s=m.v + m.w).groupby("k")
             .agg(s=("s", "sum"), c=("s", "size")).reset_index()
             .sort_values("k"))


SQL = ("select k, sum(v + w) as s, count(*) c from fact join dim "
       "on k = dk group by k order by k")


def test_skew_overflow_escalates_to_salt(env):
    ctx, f, d, mesh = env
    opts = DistOptions(n_partitions=8, broadcast_threshold=0, min_quota=16,
                       quota_headroom=1.05)
    batch, schema = execute_distributed(ctx, ctx.sql(SQL).plan, mesh, opts)
    got = B.to_pandas(batch, schema)
    exp = _expected(f, d)
    assert list(got["k"]) == list(exp["k"])
    assert list(got["s"]) == list(exp["s"])
    assert list(got["c"]) == list(exp["c"])


def test_explicit_join_salt(env):
    ctx, f, d, mesh = env
    opts = DistOptions(n_partitions=8, broadcast_threshold=0, join_salt=4)
    batch, schema = execute_distributed(ctx, ctx.sql(SQL).plan, mesh, opts)
    got = B.to_pandas(batch, schema)
    exp = _expected(f, d)
    assert list(got["s"]) == list(exp["s"])
    assert list(got["c"]) == list(exp["c"])


def test_salted_left_outer(env):
    ctx, f, d, mesh = env
    opts = DistOptions(n_partitions=8, broadcast_threshold=0, join_salt=4)
    sql = "select count(*) c, count(w) cw from fact left join dim on k = dk"
    batch, schema = execute_distributed(ctx, ctx.sql(sql).plan, mesh, opts)
    got = B.to_pandas(batch, schema)
    assert int(got["c"][0]) == len(f)
    assert int(got["cw"][0]) == int((f.k < 100).sum())


def test_stats_driven_retry_converges_in_one(env):
    """Shuffle-write stats (PartitionStats, reference
    serde/scheduler/mod.rs:33-100) must pick salt+quota from the observed
    per-destination counts so a skewed join converges on the FIRST retry —
    blind quota->salt escalation needed three attempts on this shape."""
    ctx, f, d, mesh = env
    opts = DistOptions(n_partitions=8, broadcast_threshold=0, min_quota=16,
                       quota_headroom=1.05)
    batch, schema = execute_distributed(ctx, ctx.sql(SQL).plan, mesh, opts,
                                        max_retries=2)
    got = B.to_pandas(batch, schema)
    exp = _expected(f, d)
    assert list(got["k"]) == list(exp["k"])
    assert list(got["s"]) == list(exp["s"])


def test_escalate_policy_unit():
    import numpy as np

    from ballista_tpu.scheduler.runtime import (ShuffleOverflowError,
                                                escalate_overflow_opts)

    opts = DistOptions(n_partitions=8, quota_headroom=2.0, join_salt=1)

    # hot-key skew on a saltable exchange: salt goes up, headroom stays sane
    err = ShuffleOverflowError("x")
    counts = np.full((8, 8), 10.0)
    counts[:, 3] = 500.0
    err.stats = [{"quota": 64, "salt_kind": "spread", "counts": counts}]
    out = escalate_overflow_opts(opts, err, 0)
    assert out.join_salt >= 4
    assert out.quota_headroom < opts.quota_headroom * 4  # not blind x4

    # flat undersize: quota scales by the observed ratio, no salting
    err2 = ShuffleOverflowError("x")
    err2.stats = [{"quota": 64, "salt_kind": None,
                   "counts": np.full((8, 8), 150.0)}]
    out2 = escalate_overflow_opts(opts, err2, 0)
    assert out2.join_salt == 1
    assert out2.quota_headroom == pytest.approx(2.0 * 2.0 * 150.0 / 64.0)

    # no stats (group-table overflow): blind escalation preserved
    err3 = ShuffleOverflowError("x")
    out3 = escalate_overflow_opts(opts, err3, 1)
    assert out3.quota_headroom == pytest.approx(8.0)
    assert out3.join_salt >= 2
