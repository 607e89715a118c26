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
    # cap on group hash-table slots (power of two); queries with more
    # distinct groups trip the overflow flag and retry bigger
    max_group_table: int = 1 << 16
    group_table_hint: Optional[int] = None


def create_physical_plan(plan: L.LogicalPlan,
                         capacities: Dict[str, int],
                         options: Optional[PhysicalOptions] = None) -> ExecNode:
    """capacities: table_name -> row capacity of its (single) partition."""
    opts = options or PhysicalOptions()

    def lower(p: L.LogicalPlan) -> ExecNode:
        if isinstance(p, L.TableScan):
            leaf = InputLeaf(p.table_name, p.table_schema, capacities[p.table_name])
            if p.projection is not None:
                return ProjectExec(leaf, [Col(n) for n in p.projection],
                                   names=list(p.projection))
            return leaf
        if isinstance(p, L.Filter):
            return FilterExec(lower(p.input), p.predicate)
        if isinstance(p, L.Projection):
            return ProjectExec(lower(p.input), list(p.exprs),
                               names=list(p.names) if p.names else None)
        if isinstance(p, L.Aggregate):
            child = lower(p.input)
            T = opts.group_table_hint or min(
                _next_pow2(max(child.capacity // 4, 16)), opts.max_group_table)
            return HashAggregateExec(child, list(p.group_exprs), list(p.aggs),
                                     mode="single", table_size=T,
                                     group_names=list(p.group_names) if p.group_names else None)
        if isinstance(p, L.Distinct):
            child = lower(p.input)
            T = opts.group_table_hint or min(
                _next_pow2(max(child.capacity, 16)), opts.max_group_table)
            return HashAggregateExec(child, [Col(f.name) for f in child.schema.fields],
                                     [], mode="single", table_size=T)
        if isinstance(p, L.Sort):
            return SortExec(lower(p.input), list(p.keys))
        if isinstance(p, L.Limit):
            return LimitExec(lower(p.input), p.n)
        if isinstance(p, L.Join):
            return HashJoinExec(lower(p.left), lower(p.right),
                                list(p.on), p.how)
        raise NotImplementedError(type(p).__name__)

    return lower(plan)
