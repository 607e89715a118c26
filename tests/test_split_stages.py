"""Piecewise stage compilation (exec/plan.py _split_compile) must be
bit-identical to whole-program compilation, overflow flags included."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ballista_tpu.client import SessionContext
from ballista_tpu.client.context import _rebind_scans
from ballista_tpu.exec.plan import compile_stage
from ballista_tpu.planner.physical import create_physical_plan
from ballista_tpu import batch as B


QUERY = """select d.grp, sum(f.v) s, count(*) n, min(f.v) mn
           from f join d on f.k = d.k join e on d.ek = e.ek
           where f.v > 25 group by d.grp order by d.grp"""


def _ctx():
    rng = np.random.default_rng(11)
    n = 3000
    f = pd.DataFrame({"k": rng.integers(0, 64, n),
                      "v": rng.integers(0, 1000, n)})
    d = pd.DataFrame({"k": np.arange(64), "ek": np.arange(64) % 8,
                      "grp": rng.integers(0, 6, 64)})
    e = pd.DataFrame({"ek": np.arange(8), "w": rng.integers(0, 9, 8)})
    ctx = SessionContext()
    ctx.register_arrow("f", pa.Table.from_pandas(f))
    ctx.register_arrow("d", pa.Table.from_pandas(d), primary_key=("k",))
    ctx.register_arrow("e", pa.Table.from_pandas(e), primary_key=("ek",))
    return ctx


def _run(ctx, split):
    plan = _rebind_scans(ctx.sql(QUERY).plan, ctx)
    caps = {t: tp.capacity for t, tp in ctx.tables.items()}
    ep = create_physical_plan(plan, caps, ctx.options)
    fn, ids = compile_stage(ep, with_overflow=True, split=split)
    out, overflow = fn(ctx.bind_inputs(ids))
    return B.to_pandas(out, ep.schema), bool(overflow)


def test_split_matches_whole_program():
    ctx = _ctx()
    split_df, split_ov = _run(ctx, split=True)
    whole_df, whole_ov = _run(_ctx(), split=False)
    assert split_ov == whole_ov
    pd.testing.assert_frame_equal(split_df, whole_df)


def test_split_piece_count():
    ctx = _ctx()
    plan = _rebind_scans(ctx.sql(QUERY).plan, ctx)
    caps = {t: tp.capacity for t, tp in ctx.tables.items()}
    ep = create_physical_plan(plan, caps, ctx.options)
    from ballista_tpu.exec.plan import _split_compile
    res = _split_compile(ep, with_overflow=True)
    assert res is not None  # 2 joins + agg -> must split
    # plan still reports its full input set after evaluate-patching
    _, ids = res
    names = {i.split("::")[0] for i in ids}
    assert names == {"f", "d", "e"}
