"""Physical execution operators.

Reference parity: DataFusion's `ExecutionPlan` operators plus Ballista's
distributed operators (`ballista/core/src/execution_plans/`). Unlike the
volcano pull-stream model, a whole stage here composes into ONE traced JAX
function over fixed-shape batches, jit-compiled per stage (SURVEY.md §7
design stance).
"""

from .plan import (CoalesceExec, ExecNode, FilterExec, HashAggregateExec,
                   HashJoinExec, InputLeaf, LimitExec, ProjectExec, SortExec,
                   compile_stage)
from .aggregate import AggExpr
