"""DistributedPlanner: split a logical plan into a stage DAG.

Reference parity: `ballista/scheduler/src/planner.rs:44-310` — the reference
walks the physical plan and cuts stages at repartition boundaries
(RepartitionExec(Hash) -> shuffle stage, CoalescePartitionsExec /
SortPreservingMergeExec -> merge stage). Here we cut at the logical level:

  Aggregate  -> partial agg | shuffle(group keys) | final agg
             -> (global agg) partial | all-gather | final (replicated->shard0)
  Join       -> shuffle both sides by join keys | local join
             -> (small build) all-gather broadcast build | local join in the
                probe's stage (DataFusion CollectLeft analog; Ballista lacks
                broadcast joins — strictly better on TPC-H dimension tables)
  Sort/Limit -> local sort[+limit] | all-gather | final merge sort[+limit]

Each stage's shuffle is an ExchangeExec fused at the stage root, so a stage
compiles to ONE shard_map'd XLA program whose epilogue is the all_to_all.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

from ..exprs import Col
from ..exec.plan import (ExecNode, FilterExec, HashAggregateExec, HashJoinExec,
                         InputLeaf, LimitExec, ProjectExec, SortExec,
                         _next_pow2)
from ..exec.distributed import ExchangeExec, GatherExec, PartitionPruneExec
from ..planner import logical as L
from ..batch import round_capacity


@dataclasses.dataclass
class Source:
    kind: str          # 'table' | 'stage'
    name: str          # table name or producer stage id
    columns: Optional[Tuple[str, ...]] = None  # pruned scan column subset


@dataclasses.dataclass
class Stage:
    stage_id: int
    root: ExecNode
    sources: Dict[str, Source]

    def display(self) -> str:
        hdr = f"Stage {self.stage_id} (inputs: " + ", ".join(
            f"{k}<-{v.kind}:{v.name}" for k, v in self.sources.items()) + ")\n"
        return hdr + self.root.display(1)


@dataclasses.dataclass
class DistributedPlan:
    stages: List[Stage]
    final_stage: int

    @property
    def final_schema(self):
        return self.stages[-1].root.schema

    def display(self) -> str:
        return "\n".join(s.display() for s in self.stages)


@dataclasses.dataclass
class DistOptions:
    n_partitions: int = 8
    broadcast_threshold: int = 1 << 17   # build rows below this: broadcast join
    min_quota: int = 256
    quota_headroom: float = 2.0          # x average rows/dest
    # group tables sized 2x input capacity never overflow (load <= 0.5);
    # the cap bounds memory — overflow past it triggers driver retry
    max_group_table: int = 1 << 21
    # skewed-key splitting for shuffle joins: each key spreads over
    # join_salt destinations (probe rows spread, build rows replicated);
    # escalated by the overflow-retry driver when quota bumps don't clear
    join_salt: int = 1


class DistributedPlanner:
    def __init__(self, ctx, options: DistOptions):
        self.ctx = ctx
        self.opts = options
        self._stages: List[Stage] = []
        self._sources: Dict[str, Source] = {}
        self._next_stage = 0

    # -- stage cutting --
    def _close_stage(self, root: ExecNode) -> int:
        from ..exec.cse import cse_tree
        from ..exec.plan import plan_sparse_flow
        plan_sparse_flow(root)  # intra-stage compaction elision; the stage
        # root itself stays dense (walk starts parent_accepts=False)
        root = cse_tree(root)
        sid = self._next_stage
        self._next_stage += 1
        sources = {}
        for leaf in root.leaves():
            sources[leaf.input_id] = self._sources[leaf.input_id]
        self._stages.append(Stage(sid, root, sources))
        return sid

    def _cut(self, root: ExecNode) -> InputLeaf:
        sid = self._close_stage(root)
        leaf_id = f"stage_{sid}"
        leaf = InputLeaf(leaf_id, root.schema, root.capacity)
        self._sources[leaf_id] = Source("stage", str(sid))
        return leaf

    def _cut_shuffle(self, root: ExecNode, key_names, expected_rows: int,
                     salt: int = 1, salt_mode: str | None = None,
                     salt_kind: str | None = None) -> InputLeaf:
        P = self.opts.n_partitions
        # quota is PER (sender, destination) CELL of the all_to_all.
        # `expected_rows` is the PER-SHARD estimate (callers pass the
        # already-sharded child's capacity), so a cell carries
        # ~expected_rows/P and the receive buffer P*quota ~
        # headroom*expected_rows shrinks with the mesh (total/P).
        # (A /P^2 variant was tried in r4 on a misreading of
        # expected_rows as the TOTAL relation size; it under-sized cells
        # by P and q12@4dev overflowed every execution.)
        quota = max(self.opts.min_quota,
                    round_capacity(int(self.opts.quota_headroom
                                       * expected_rows / P)))
        return self._cut(ExchangeExec(root, key_names, P, quota,
                                      salt=salt, salt_mode=salt_mode,
                                      salt_kind=salt_kind))

    def _cut_gather(self, root: ExecNode) -> InputLeaf:
        return self._cut(GatherExec(root, self.opts.n_partitions))

    # -- lowering --
    def plan(self, plan: L.LogicalPlan) -> DistributedPlan:
        root = self._lower(plan)
        final = self._close_stage(root)
        return DistributedPlan(self._stages, final)

    def _agg_table(self, child_cap: int) -> int:
        return min(_next_pow2(max(2 * child_cap, 16)), self.opts.max_group_table)

    def _lower(self, p: L.LogicalPlan) -> ExecNode:
        if isinstance(p, L.OneRow):
            # one row on shard 0 only (every shard runs the same program)
            from ..exec.plan import OneRowExec
            return PartitionPruneExec(OneRowExec())
        if isinstance(p, L.TableScan):
            tp = self.ctx.tables[p.table_name]
            # stage-program binding needs the scanned columns' ingest
            # metadata (dictionaries/bounds); host-side only — the mesh
            # runtime ingests the shards itself
            if hasattr(tp, "ensure_meta"):
                tp.ensure_meta(p.projection
                               or [f.name for f in tp.schema.fields])
            per_shard = round_capacity(-(-tp.capacity // self.opts.n_partitions))
            if p.projection is not None:
                # pruned scan: the runtime ships only these columns to the
                # mesh (leaf id distinguishes column subsets)
                leaf_id = f"{p.table_name}#{'_'.join(p.projection)}"
                leaf = InputLeaf(leaf_id, tp.schema.select(p.projection),
                                 per_shard)
                self._sources[leaf_id] = Source("table", p.table_name,
                                                columns=tuple(p.projection))
                return leaf
            leaf = InputLeaf(p.table_name, tp.schema, per_shard)
            self._sources[p.table_name] = Source("table", p.table_name)
            return leaf
        if isinstance(p, L.Filter):
            return FilterExec(self._lower(p.input), p.predicate)
        if isinstance(p, L.Projection):
            return ProjectExec(self._lower(p.input), list(p.exprs),
                               names=list(p.names) if p.names else None)
        if isinstance(p, (L.Aggregate, L.Distinct)):
            from ..planner.physical import _strip_filters
            if isinstance(p, L.Distinct):
                child = self._lower(p.input)
                pred = None
                group_exprs = [Col(f.name) for f in child.schema.fields]
                aggs = []
                group_names = [f.name for f in child.schema.fields]
            else:
                inp, pred = _strip_filters(p.input)
                child = self._lower(inp)
                group_exprs = list(p.group_exprs)
                aggs = list(p.aggs)
                group_names = (list(p.group_names) if p.group_names
                               else None)
            T = self._agg_table(child.capacity)
            from ..exec.aggregate import NON_DECOMPOSABLE
            if any(a.kind in NON_DECOMPOSABLE for a in aggs):
                # median/percentile states don't merge: shuffle raw ROWS on
                # the group key and aggregate once per shard (DataFusion
                # treats Median the same way). Non-column group exprs fall
                # back to a gather + single aggregate on shard 0.
                if pred is not None:
                    child = FilterExec(child, pred)
                if group_exprs and all(isinstance(g, Col)
                                       for g in group_exprs):
                    leaf = self._cut_shuffle(
                        child, [g.name for g in group_exprs],
                        expected_rows=child.capacity * self.opts.n_partitions)
                    return HashAggregateExec(leaf, group_exprs, aggs,
                                             mode="single", table_size=T,
                                             group_names=group_names)
                leaf = self._cut_gather(child)
                final = HashAggregateExec(leaf, group_exprs, aggs,
                                          mode="single",
                                          table_size=self._agg_table(
                                              leaf.capacity),
                                          group_names=group_names)
                return PartitionPruneExec(final)
            partial = HashAggregateExec(child, group_exprs, aggs,
                                        mode="partial", table_size=T,
                                        group_names=group_names,
                                        pre_filter=pred)
            if group_exprs:
                key_names = [f.name for f in
                             partial.schema.fields[:len(group_exprs)]]
                # size the state exchange by the aggregate's REFINED
                # output bound (dict/int-bound group-key analysis shrinks
                # partial.capacity to the group-count bound), not the raw
                # group-table size T: q12's 7-value shipmode key got a
                # 1M-slot exchange (2M-row receive buffer for 4 rows) —
                # the dominant stage of the whole query
                leaf = self._cut_shuffle(partial, key_names,
                                         expected_rows=partial.capacity)
                Tf = min(_next_pow2(max(2 * leaf.capacity, 16)),
                         self.opts.max_group_table * self.opts.n_partitions)
                return HashAggregateExec(leaf, [Col(k) for k in key_names],
                                         aggs, mode="final", table_size=Tf,
                                         group_names=key_names)
            # global aggregate: states are tiny -> all-gather + replicated final
            leaf = self._cut_gather(partial)
            final = HashAggregateExec(leaf, [], aggs, mode="final",
                                      table_size=16)
            return PartitionPruneExec(final)
        if isinstance(p, L.Join):
            if p.how == "cross":
                # broadcast the build side; probe stays sharded
                from ..exec.plan import CrossJoinExec
                bleaf = self._cut_gather(self._lower(p.left))
                return CrossJoinExec(bleaf, self._lower(p.right))
            build = self._lower(p.left)
            on = list(p.on)
            # FULL OUTER needs key-colocated shards: a replicated build would
            # append its unmatched rows once per partition
            if (p.how != "full_outer" and build.capacity
                    <= self.opts.broadcast_threshold // max(self.opts.n_partitions, 1)):
                # broadcast path: the probe stays in this stage, so its
                # filters fuse into the join live-mask (saves a compaction
                # sort per filter); build is cut (compacts before gather)
                from ..planner.physical import _strip_filters
                if p.how == "left_outer" and p.unique_build:
                    pinner, ppred = p.right, None
                else:
                    pinner, ppred = _strip_filters(p.right)
                probe = self._lower(pinner)
                bleaf = self._cut_gather(build)
                return HashJoinExec(bleaf, probe, on, p.how,
                                    unique_build=p.unique_build,
                                    probe_pre_filter=ppred)
            probe = self._lower(p.right)
            bkeys = [a for a, _ in on]
            pkeys = [b for _, b in on]
            # salted joins (skew splitting): probe rows of one key spread
            # over S shards, build rows replicated to all S. The S replicas
            # land on S consecutive shards mod P (distinct for S <= P), so
            # per-shard build-key uniqueness is preserved. Disallowed for
            # full_outer (replicated builds would re-append unmatched rows).
            S = (min(self.opts.join_salt, self.opts.n_partitions)
                 if p.how != "full_outer" else 1)
            saltable = p.how != "full_outer"
            bleaf = self._cut_shuffle(
                build, bkeys, expected_rows=build.capacity * S,
                salt=S, salt_mode="replicate" if S > 1 else None,
                salt_kind="replicate" if saltable else None)
            pleaf = self._cut_shuffle(
                probe, pkeys, expected_rows=probe.capacity,
                salt=S, salt_mode="spread" if S > 1 else None,
                salt_kind="spread" if saltable else None)
            return HashJoinExec(bleaf, pleaf, on, p.how,
                                unique_build=p.unique_build)
        if isinstance(p, L.Sort):
            if _single_partition(p.input):
                return SortExec(self._lower(p.input), list(p.keys))
            child = self._lower(p.input)
            local = SortExec(child, list(p.keys))
            leaf = self._cut_gather(local)
            final = SortExec(leaf, list(p.keys))
            return PartitionPruneExec(final)
        if isinstance(p, L.Limit):
            if isinstance(p.input, L.Sort) and not _single_partition(p.input.input):
                # top-k: local sort+limit, gather, merge sort+limit
                child = self._lower(p.input.input)
                local = LimitExec(SortExec(child, list(p.input.keys)), p.n)
                leaf = self._cut_gather(local)
                final = LimitExec(SortExec(leaf, list(p.input.keys)), p.n)
                return PartitionPruneExec(final)
            child = self._lower(p.input)
            if _single_partition(p.input):
                return LimitExec(child, p.n)
            local = LimitExec(child, p.n)
            leaf = self._cut_gather(local)
            return PartitionPruneExec(LimitExec(leaf, p.n))
        if isinstance(p, L.Window):
            # beats reference capability: Ballista's planner rejects window
            # plans (planner.rs:155). If every spec shares one non-empty
            # PARTITION BY column list, shuffle rows onto those keys and run
            # the window locally per shard; otherwise gather to one shard.
            from ..exec.window import WindowExec
            child = self._lower(p.input)
            pkeys = _common_partition_cols(p.specs)
            if pkeys and not _single_partition(p.input):
                leaf = self._cut_shuffle(child, pkeys,
                                         expected_rows=child.capacity)
                return WindowExec(leaf, p.specs)
            if not _single_partition(p.input):
                leaf = self._cut_gather(child)
                return PartitionPruneExec(WindowExec(leaf, p.specs))
            return WindowExec(child, p.specs)
        if isinstance(p, L.Union):
            from ..exec.plan import CoalesceExec
            from ..planner.physical import align_union_inputs
            return CoalesceExec(align_union_inputs(
                [self._lower(c) for c in p.inputs]))
        raise NotImplementedError(type(p).__name__)


def _single_partition(p: L.LogicalPlan) -> bool:
    """True if the plan's distributed output is already on one shard
    (replicated-pruned), so no merge stage is needed."""
    if isinstance(p, (L.Sort, L.Limit)):
        return _single_partition(p.input)
    if isinstance(p, L.Window):
        # shuffled windows stay sharded; gathered ones end up pruned
        return (_single_partition(p.input)
                or _common_partition_cols(p.specs) is None)
    if isinstance(p, L.Aggregate):
        return not p.group_exprs
    if isinstance(p, (L.Projection, L.Filter)):
        return _single_partition(p.input)
    return False


def _common_partition_cols(specs) -> Optional[List[str]]:
    """Shared PARTITION BY column-name list if every spec partitions by the
    same plain columns (shuffle key for distributed windows); else None."""
    first = None
    for s in specs:
        if not s.partition_by or not all(isinstance(e, Col)
                                         for e in s.partition_by):
            return None
        names = sorted(e.name for e in s.partition_by)
        if first is None:
            first = names
        elif names != first:
            return None
    return first
