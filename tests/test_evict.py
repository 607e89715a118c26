"""HBM lifecycle regression: the sweep's release pattern must actually
free device buffers. Round-3 SF10 lesson: the loop's fn/inputs/out locals
pinned the compiled program + bound table columns after evict_device(),
so eviction freed nothing and every query after the first big one died
RESOURCE_EXHAUSTED (runner.py now clears them + jax caches)."""

import gc

import jax

from ballista_tpu.client import SessionContext
from ballista_tpu.client.context import _rebind_scans
from ballista_tpu.datagen import register_tpch
from ballista_tpu.planner.optimizer import prune_columns


def test_release_pattern_frees_buffers():
    from ballista_tpu.benchmarks.queries import TPCH_QUERIES

    ctx = SessionContext()
    register_tpch(ctx, 0.01)
    plan = _rebind_scans(prune_columns(ctx.sql(TPCH_QUERIES[1]).plan), ctx)
    fn, inputs, ep, out = ctx.converge_compile(plan, pruned=True)
    assert int(out.num_rows) == 4
    gc.collect()
    n_during = len(jax.live_arrays())
    assert n_during > 0  # table columns + outputs are device-live

    # the runner's between-queries release (runner.py evict_between path)
    fn = inputs = ep = out = None
    ctx.evict_device()
    jax.clear_caches()
    gc.collect()
    n_after = len(jax.live_arrays())
    # everything the query pinned must be gone (a few cached constants
    # may survive); the round-3 bug kept ALL of it alive
    assert n_after <= max(4, n_during // 4), (n_during, n_after)
