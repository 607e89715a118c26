"""Plan-level HBM footprint model + in-core vs out-of-core routing.

The reference engine streams batches so a query's working set is bounded
by `batch_size` and spills to disk otherwise; an XLA stage program instead
allocates every operator buffer ahead of time, so a plan whose summed
buffers exceed HBM fails at COMPILE time (SF10 q5/q8: the expanding-join
buffers alone outgrow the 16 GB chip). This module walks a compiled
physical plan and prices each operator's device buffers so the session
can route oversized plans to the out-of-core serial runtime
(`scheduler/serial.py`) automatically — the reference needs no analog
because disk spill is implicit in its volcano model
(`shuffle_writer.rs:234` materializes between stages as a matter of
course).

The model intentionally over-approximates (sums ALL operator buffers;
XLA's liveness analysis frees dead ones): routing a borderline query
out-of-core costs seconds, while under-estimating wedges the sweep with
RESOURCE_EXHAUSTED. Calibrated against the SF10 on-chip record: q1-q9
in-core estimates sit well under the chip, q5/q8 far above it.
"""

from __future__ import annotations

import os
from typing import Dict

from ..schema import Schema, TypeKind

_DTYPE_BYTES = {
    TypeKind.BOOL: 1,
    TypeKind.INT32: 4,
    TypeKind.INT64: 8,
    TypeKind.FLOAT32: 4,
    TypeKind.FLOAT64: 8,
    TypeKind.DATE32: 4,
    TypeKind.DECIMAL: 8,
    TypeKind.STRING: 4,      # dictionary codes (int32) on device
}


def row_bytes(schema: Schema) -> int:
    """Per-row device bytes of one batch: data plane + validity bool."""
    return sum(_DTYPE_BYTES[f.dtype.kind] + 1 for f in schema.fields)


def batch_bytes(schema: Schema, capacity: int) -> int:
    return capacity * row_bytes(schema)


def _node_transient(node) -> int:
    """Device bytes of a node's internal working set beyond its output
    batch: hash tables, sort operand planes, scatter buffers."""
    from .plan import (CrossJoinExec, FilterExec, HashAggregateExec,
                      HashJoinExec, NestedLoopJoinExec, SortExec)
    from .window import WindowExec

    if isinstance(node, FilterExec):
        # compaction argsort: key + index planes, in + out copies
        return node.capacity * 8 * 4
    if isinstance(node, HashAggregateExec):
        # slot table (key + 2 state planes per agg) + the segment-sort
        # planes over the input capacity
        width = len(node.group_exprs) + 2 * len(node.aggs) + 2
        return (node.table_size * width * 8
                + node.children[0].capacity * 8 * 4)
    if isinstance(node, HashJoinExec):
        build, probe = node.children
        n_tot = build.capacity + probe.capacity
        # cosort operand planes (key limb + index + payload limbs or raw
        # payload columns), input + sorted copies
        ops = 2 + (1 if node._pay_plan is not None
                   else len(build.schema.fields))
        t = n_tot * ops * 8 * 2 + node.table_size * 8
        if not node.unique_build:
            # expanding join: per-output-column scatter buffers at
            # out_capacity + the prefix-sum planes
            t += batch_bytes(node.schema, node.capacity)
        return t
    if isinstance(node, (NestedLoopJoinExec, CrossJoinExec)):
        return batch_bytes(node.schema, node.capacity) * 2
    if isinstance(node, (SortExec, WindowExec)):
        # variadic sort: every (packed) operand in + out; packing
        # (ops/vsort _pack_columns) roughly halves raw operand count
        ops = max(len(node.schema.fields) // 2 + 1, 2)
        return node.capacity * ops * 8 * 2
    if type(node).__name__ == "ExchangeExec":
        return batch_bytes(node.schema, node.capacity)
    return 0


def estimate_plan_hbm(root, detail: bool = False):
    """Peak device bytes for a piecewise-compiled plan.

    Mirrors `plan._split_compile`'s execution model: the plan runs as a
    DAG of per-heavy-operator XLA programs with device-resident handoff,
    and each handoff is freed after its last consumer (last_use map in
    `_split_compile.run`). The live set while piece P runs is:

        table input columns (cached in TableProvider for the query)
      + handoff batches produced but not yet fully consumed
      + P's inputs + P's output + P's internal transients

    Peak = max over pieces. Calibrated against the SF10 on-chip record
    (16 GB v5e): q1-q4/q6/q7/q9 ran in-core, q5/q8 exceeded HBM at
    compile (`bench_logs/sf10_r3.log`: 'would exceed memory
    (size=17179869184)')."""
    from .plan import _CUT_NODE_NAMES, _HEAVY_NODE_NAMES, InputLeaf

    order, seen = [], set()

    def post(n):
        if id(n) in seen:
            return
        seen.add(id(n))
        for c in n.children:
            post(c)
        order.append(n)

    post(root)

    heavy = [n for n in order if type(n).__name__ in _HEAVY_NODE_NAMES]
    cuts = [n for n in order
            if type(n).__name__ in _CUT_NODE_NAMES and n is not root]
    if len(heavy) < 2 or not cuts:
        cuts = []                      # single-program compile

    # table input columns: live for the whole query
    leaf_bytes = sum(batch_bytes(l.schema, l.capacity)
                     for l in {id(l): l for l in root.leaves()}.values())

    cut_ids = {id(n): k for k, n in enumerate(cuts)}

    def piece_members(piece_root, is_root_piece=False):
        """Nodes inside one piece: subtree without descending past cuts.
        Returns (internal nodes, input handoff cut-indices)."""
        members, handoffs, stack, visited = [], [], [piece_root], set()
        while stack:
            n = stack.pop()
            if id(n) in visited:
                continue
            visited.add(id(n))
            if n is not piece_root and id(n) in cut_ids:
                handoffs.append(cut_ids[id(n)])
                continue
            if isinstance(n, InputLeaf):
                continue
            members.append(n)
            stack.extend(n.children)
        return members, handoffs

    pieces = [(n, *piece_members(n)) for n in cuts]
    pieces.append((root, *piece_members(root, True)))

    # handoff lifetime: index of last piece consuming each cut output
    last_use = {}
    for pos, (_n, _members, handoffs) in enumerate(pieces):
        for h in handoffs:
            last_use[h] = pos

    peak, rows = 0, []
    live_handoffs: Dict[int, int] = {}
    for pos, (n, members, handoffs) in enumerate(pieces):
        out = batch_bytes(n.schema, n.capacity)
        trans = sum(_node_transient(m) for m in members)
        in_bytes = sum(live_handoffs[h] for h in handoffs)
        other_live = sum(v for k, v in live_handoffs.items()
                         if k not in handoffs)
        total = leaf_bytes + other_live + in_bytes + out + trans
        rows.append((type(n).__name__, total, out, trans))
        peak = max(peak, total)
        for h in handoffs:
            if last_use[h] == pos:
                live_handoffs.pop(h, None)
        if id(n) in cut_ids:
            live_handoffs[cut_ids[id(n)]] = out
    if detail:
        return peak, rows
    return peak


def hbm_budget_bytes() -> int:
    """Usable device memory for one stage program. Overridable via
    BALLISTA_HBM_BYTES; defaults to the device's reported limit (v5e:
    ~16 GB) scaled by 0.82 for XLA's reserved/fragmentation slack."""
    env = os.environ.get("BALLISTA_HBM_BYTES")
    if env:
        return int(float(env))
    limit = None
    try:
        import jax
        stats = jax.local_devices()[0].memory_stats()
        if stats:
            limit = stats.get("bytes_limit")
    except Exception:  # noqa: BLE001 - CPU/virtual devices: no stats
        limit = None
    if not limit:
        limit = 16 * 1024 ** 3
    return int(limit * 0.82)


def route_serial(exec_plan, budget: int = 0) -> int:
    """Automatic in-core vs out-of-core decision for a physical plan.

    Returns 0 (run in-core) or a serial partition count N>0 (run via
    scheduler/serial.py). Routes to serial only when the estimate is
    well above budget (BALLISTA_ROUTE_FACTOR, default 2.2x): the model
    over-approximates ~2x on deep join plans (sums all piece buffers;
    XLA frees aggressively), and the round-5 record shows every SF10
    query — estimates up to 27.9 GiB — running in-core on the 16 GB
    chip once the padded-gather hazard was fixed (ops/gather.py;
    bench_logs/sf10_r5_incore.log: q5 5.1s, q8 10.9s, q9 9.6s,
    q10 10.3s, all oracle-verified). Borderline plans try in-core
    first and rely on the caller's RESOURCE_EXHAUSTED fallback + the
    OOM memo. Setting BALLISTA_ROUTE_FACTOR=0 disables auto-routing
    entirely."""
    factor = float(os.environ.get("BALLISTA_ROUTE_FACTOR", "2.2"))
    if factor <= 0:
        return 0
    memo_n = oom_memo_lookup(plan_fingerprint(exec_plan))
    if memo_n:
        return memo_n
    budget = budget or hbm_budget_bytes()
    est = estimate_plan_hbm(exec_plan)
    if est <= budget * factor:
        return 0
    return plan_serial_partitions(est, budget)


def _oom_memo_path() -> str:
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    return os.path.join(cache, "ballista_oom_memo.json")


def plan_fingerprint(exec_plan) -> str:
    """Stable id of a compiled plan shape (operator tree + capacities —
    display() embeds both)."""
    import hashlib
    return hashlib.sha256(exec_plan.display().encode()).hexdigest()[:24]


def oom_memo_lookup(fingerprint: str) -> int:
    """Serial partition count a previous process learned for this plan
    shape after an in-core OOM; 0 = no memo. The estimator's ±30% error
    band means borderline plans (q5/q8@SF10 estimate BELOW q9, which
    fits) can only be learned, not predicted — the memo makes the doomed
    compile a once-per-shape cost instead of once-per-process."""
    import json
    try:
        with open(_oom_memo_path()) as f:
            return int(json.load(f).get(fingerprint, 0))
    except Exception:  # noqa: BLE001 - absent/corrupt memo = no routing
        return 0


def oom_memo_record(fingerprint: str, n_parts: int) -> None:
    import json
    path = _oom_memo_path()
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        try:
            with open(path) as f:
                memo = json.load(f)
        except Exception:  # noqa: BLE001
            memo = {}
        memo[fingerprint] = int(n_parts)
        tmp = f"{path}.tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(memo, f)
        os.replace(tmp, path)
    except Exception:  # noqa: BLE001 - memo is an optimization only
        pass


def plan_serial_partitions(estimate: int, budget: int,
                           max_parts: int = 64) -> int:
    """Partition count for the out-of-core runtime: each partition's
    working set should land around half the budget (headroom for the
    exchange-assembly buffers that don't shrink with P)."""
    n = 2
    while n < max_parts and estimate / n > budget * 0.5:
        n *= 2
    return n
