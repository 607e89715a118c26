"""Lower a LogicalPlan to an ExecNode tree (single-partition physical plan).

Reference parity: DataFusion's physical planner, invoked by Ballista's
scheduler during job submission (`SchedulerState::submit_job`,
state/mod.rs:433). The distributed stage splitting on top of this lives in
`scheduler.distributed_planner` (the `DistributedPlanner` analog).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

from ..exec.plan import (ExecNode, FilterExec, HashAggregateExec, HashJoinExec,
                         InputLeaf, LimitExec, ProjectExec, SortExec,
                         _next_pow2)
from ..exprs import Col
from . import logical as L


@dataclasses.dataclass
class PhysicalOptions:
    # cap on group hash-table slots (power of two); tables sized 2x input
    # capacity never overflow (load <= 0.5); the cap bounds memory and
    # overflow past it trips the retry flag
    max_group_table: int = 1 << 21
    group_table_hint: Optional[int] = None
    # expanding-join output capacity = factor * (build_cap + probe_cap);
    # overflow triggers a retry with 4x the factor
    join_out_factor: float = 1.0


def align_union_inputs(kids):
    """Rename every input's columns to the first input's names and re-encode
    string columns against union dictionaries so codes agree across inputs."""
    import numpy as np
    from ..exec.plan import DictRemapExec, ProjectExec as PE
    from ..exprs import Col as C
    from ..schema import TypeKind

    names = [f.name for f in kids[0].schema.fields]
    renamed = [kids[0]]
    for k in kids[1:]:
        renamed.append(PE(k, [C(f.name) for f in k.schema.fields], names=names))
    # columns needing a shared dictionary: differing per-branch dicts, or a
    # dict present in some branches but absent in others (e.g. a grouping-set
    # branch projecting a typed-NULL key: codes are all-invalid but the
    # union's schema still must carry the dictionary)
    union_dicts = {}
    for i, f in enumerate(renamed[0].schema.fields):
        if f.dtype.kind is not TypeKind.STRING:
            continue
        dicts = [r.schema.dictionary(names[i]) for r in renamed]
        present = [d for d in dicts if d is not None]
        if not present:
            continue
        same = all(len(d) == len(present[0])
                   and (d.astype(str) == present[0].astype(str)).all()
                   for d in present[1:])
        if same and len(present) == len(dicts):
            continue
        union = np.unique(np.concatenate([d.astype(str) for d in present]))
        union_dicts[names[i]] = union.astype(object)
    if not union_dicts:
        return renamed
    out = []
    for r in renamed:
        luts = {}
        for n, u in union_dicts.items():
            d = r.schema.dictionary(n)
            if d is None:  # column is all-NULL in this branch; no remap
                continue
            if len(d) == len(u) and (d.astype(str) == u.astype(str)).all():
                continue
            luts[n] = np.searchsorted(u, d.astype(str))
        out.append(DictRemapExec(r, luts, union_dicts))
    return out


def _strip_filters(p: L.LogicalPlan):
    """Peel Filter nodes off a plan; returns (inner, conjoined predicate).
    Used to fuse filtering into the aggregation live-mask."""
    from ..exprs import BinOp
    preds = []
    while isinstance(p, L.Filter):
        preds.append(p.predicate)
        p = p.input
    if not preds:
        return p, None
    out = preds[0]
    for q in preds[1:]:
        out = BinOp("and", out, q)
    return p, out


def create_physical_plan(plan: L.LogicalPlan,
                         capacities: Dict[str, int],
                         options: Optional[PhysicalOptions] = None) -> ExecNode:
    """capacities: table_name -> row capacity of its (single) partition."""
    opts = options or PhysicalOptions()
    # column pruning is load-bearing on TPU: every surplus column through a
    # join costs two ~90ms/6M-row gathers at materialization plus sort
    # payload slots in every compaction (idempotent if the caller pruned)
    from .optimizer import prune_columns, reduce_group_keys
    plan = prune_columns(reduce_group_keys(plan))

    def lower(p: L.LogicalPlan) -> ExecNode:
        if isinstance(p, L.OneRow):
            from ..exec.plan import OneRowExec
            return OneRowExec()
        if isinstance(p, L.TableScan):
            cap = capacities[p.table_name]
            if p.projection is not None:
                # column-scoped input id: the runtime binds only the
                # projected columns (SessionContext.bind_inputs), so
                # unused table columns never reach HBM — at SF10 a full
                # lineitem batch is ~7 GB vs ~2.5 GB for q1's columns
                iid = p.table_name + "::" + ",".join(p.projection)
                return InputLeaf(iid, p.table_schema.select(p.projection),
                                 cap)
            return InputLeaf(p.table_name, p.table_schema, cap)
        def lower_filtered_cross(join, predicate):
            """Theta join over a too-large cross product: fuse the
            residual predicate into a chunked nested-loop join instead of
            materializing the product. Returns None if the product is
            small enough for CrossJoinExec (caller applies the filter)."""
            from ..exec.plan import (CrossJoinExec, NestedLoopJoinExec,
                                     _static_one_row)
            b, pr = lower(join.left), lower(join.right)
            if (b.capacity * pr.capacity > CrossJoinExec.MAX_CELLS
                    and not _static_one_row(b)
                    and not _static_one_row(pr)):
                return NestedLoopJoinExec(b, pr, predicate, opts)
            return FilterExec(CrossJoinExec(b, pr), predicate)

        if isinstance(p, L.Filter):
            if isinstance(p.input, L.Join) and p.input.how == "cross":
                return lower_filtered_cross(p.input, p.predicate)
            return FilterExec(lower(p.input), p.predicate)
        if isinstance(p, L.Projection):
            return ProjectExec(lower(p.input), list(p.exprs),
                               names=list(p.names) if p.names else None)
        if isinstance(p, L.Aggregate):
            inp, pred = _strip_filters(p.input)
            if pred is not None and isinstance(inp, L.Join) \
                    and inp.how == "cross":
                # the stripped WHERE is the theta predicate of a cross
                # join: route through the same NLJ-or-cross lowering the
                # Filter branch uses instead of exposing a bare product
                child = lower_filtered_cross(inp, pred)
                pred = None
            else:
                child = lower(inp)
            T = opts.group_table_hint or min(
                _next_pow2(max(2 * child.capacity, 16)), opts.max_group_table)
            return HashAggregateExec(child, list(p.group_exprs), list(p.aggs),
                                     mode="single", table_size=T,
                                     group_names=list(p.group_names) if p.group_names else None,
                                     pre_filter=pred)
        if isinstance(p, L.Distinct):
            child = lower(p.input)
            T = opts.group_table_hint or min(
                _next_pow2(max(2 * child.capacity, 16)), opts.max_group_table)
            return HashAggregateExec(child, [Col(f.name) for f in child.schema.fields],
                                     [], mode="single", table_size=T)
        if isinstance(p, L.Sort):
            return SortExec(lower(p.input), list(p.keys))
        if isinstance(p, L.Limit):
            return LimitExec(lower(p.input), p.n, getattr(p, "offset", 0))
        if isinstance(p, L.Join):
            if p.how == "cross":
                from ..exec.plan import CrossJoinExec
                return CrossJoinExec(lower(p.left), lower(p.right))
            # outer joins must not fuse filters into live-masks: dropped
            # rows would resurface as outer-null rows, so keep FilterExecs
            if p.how == "full_outer":
                binner, bpred = p.left, None
            else:
                binner, bpred = _strip_filters(p.left)
            # the unique-build left_outer path is positional: probe rows
            # can't be dropped by a mask, so keep its FilterExec
            if p.how in ("left_outer", "full_outer") and p.unique_build:
                pinner, ppred = p.right, None
            else:
                pinner, ppred = _strip_filters(p.right)
            build, probe = lower(binner), lower(pinner)
            out_cap = None
            if not p.unique_build and p.how not in ("semi", "anti"):
                from ..batch import round_capacity
                out_cap = round_capacity(int(
                    opts.join_out_factor * (build.capacity + probe.capacity)))
            return HashJoinExec(build, probe, list(p.on), p.how,
                                unique_build=p.unique_build,
                                out_capacity=out_cap,
                                build_pre_filter=bpred,
                                probe_pre_filter=ppred)
        if isinstance(p, L.Window):
            from ..exec.window import WindowExec
            return WindowExec(lower(p.input), p.specs)
        if isinstance(p, L.Union):
            from ..exec.plan import CoalesceExec
            return CoalesceExec(align_union_inputs([lower(c) for c in p.inputs]))
        raise NotImplementedError(type(p).__name__)

    from ..exec.cse import cse_tree
    from ..exec.plan import plan_sparse_flow
    return cse_tree(plan_sparse_flow(lower(plan)))
