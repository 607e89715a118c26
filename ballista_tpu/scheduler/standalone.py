"""Standalone cluster: scheduler control plane driving the mesh data plane
in one process.

Reference parity: `standalone.rs:42` (in-proc scheduler + executor, used by
`BallistaContext::standalone`) — but single-controller: the "executor" is a
TaskLauncher that runs each stage as one multi-partition task on the device
mesh. Jobs flow through the REAL control plane (SchedulerServer event loop,
ExecutionGraph state machine, slots, retries), so failures/retries behave
exactly as in distributed operation while the data path stays on-device.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional

import jax.numpy as jnp

from ..parallel.partitioned import gather_partitions
from .distributed_planner import DistOptions, DistributedPlan, DistributedPlanner
from .execution_graph import (ExecutionGraph, JobState, TaskDescription,
                              TaskStatus)
from .runtime import DistributedRuntime, ShuffleOverflowError
from .server import ExecutorMetadata, SchedulerServer, TaskLauncher, random_job_id

log = logging.getLogger("ballista_tpu.standalone")


class MeshTaskLauncher(TaskLauncher):
    """Executes stage-tasks on the mesh runtime; reports TaskStatus back.

    A task covers all partitions of one stage (the SPMD program runs them
    together). Stage outputs are stored per job for consumer stages; quota
    overflows re-plan the stage with more headroom and retry in place
    (the fetch-failure-rollback analog for fixed-quota collectives)."""

    def __init__(self, runtime: DistributedRuntime):
        self.runtime = runtime
        self.jobs: Dict[str, "JobContext"] = {}
        self.scheduler = None   # set by StandaloneCluster for CB updates

    def _circuit_breaker_update(self, jc, stage_id: int):
        """CircuitBreakerClient analog (circuit_breaker/client.rs:65): when
        a stage carries a global row limit, stream per-partition
        percent-of-limit-consumed to the scheduler controller."""
        if self.scheduler is None:
            return
        from ..exec.plan import LimitExec
        stage = jc.stage_by_id[stage_id]
        node, limit = stage.root, None
        while node is not None:
            if isinstance(node, LimitExec):
                limit = node.n
                break
            node = node.children[0] if node.children else None
        if not limit:
            return
        out = jc.outputs.get(str(stage_id))
        if out is None:
            return
        import numpy as np
        rows = np.asarray(out.num_rows)
        self.scheduler.send_circuit_breaker_update(
            [(jc.job_id, "global-limit", stage_id, 0, p,
              float(rows[p]) / limit) for p in range(len(rows))])

    def launch(self, tasks: List[TaskDescription], report):
        statuses = []
        for task in tasks:
            jc = self.jobs[task.job_id]
            try:
                jc.run_stage(task.stage_id)
                self._circuit_breaker_update(jc, task.stage_id)
                statuses.append(TaskStatus(
                    task.task_id, task.job_id, task.stage_id, task.partitions,
                    task.executor_id, "successful"))
            except Exception as e:  # noqa: BLE001 - feed the retry machinery
                from ..errors import classify
                err = classify(e)
                log.warning("stage %s/%s failed (%s): %s", task.job_id,
                            task.stage_id, err.kind, e)
                statuses.append(TaskStatus(
                    task.task_id, task.job_id, task.stage_id, task.partitions,
                    task.executor_id, "failed", str(err),
                    error_kind=err.kind))
        report(statuses)


class JobContext:
    def __init__(self, job_id: str, dplan: DistributedPlan,
                 runtime: DistributedRuntime, ctx, logical_plan,
                 spiller=None, peer_fetch=None):
        self.job_id = job_id
        self.dplan = dplan
        self.runtime = runtime
        self.ctx = ctx
        self.logical_plan = logical_plan
        self.outputs: Dict[str, object] = {}
        self.op_metrics: Dict[int, dict] = {}
        self.stage_by_id = {s.stage_id: s for s in dplan.stages}
        # Replicator parity: stage outputs spilled to disk survive loss of
        # the in-memory copies and restore without re-running producers
        self.spiller = spiller
        # peer-to-peer read tier (shuffle_reader.rs:226 FlightRemote):
        # callable (job_id, stage_id, mesh) -> PartitionedBatch | None that
        # pulls the producing executor's stage output directly over its
        # data endpoint; tried after the local/store tiers miss
        self.peer_fetch = peer_fetch

    def run_stage(self, stage_id: int, max_quota_retries: int = 3):
        import dataclasses as dc

        for attempt in range(max_quota_retries):
            stage = self.stage_by_id[stage_id]
            fn, leaf_ids, op_labels, ex_meta = \
                self.runtime._compile_stage(stage)
            inputs = {}
            for lid in leaf_ids:
                src = stage.sources[lid]
                if src.kind == "table":
                    pb, _ = self.runtime.table_partitions(
                        src.name, getattr(src, "columns", None))
                else:
                    pb = self.outputs.get(src.name)
                    if pb is None and self.spiller is not None:
                        # object-store fallback read (shuffle_reader.rs:787)
                        pb = self.spiller.restore(self.job_id, int(src.name),
                                                  self.runtime.mesh)
                        if pb is not None:
                            self.outputs[src.name] = pb
                    if pb is None and self.peer_fetch is not None:
                        # three-tier read, remote tier: pull straight from
                        # the producing executor (shuffle_reader.rs:395-537)
                        pb = self.peer_fetch(self.job_id, int(src.name),
                                             self.runtime.mesh)
                        if pb is not None:
                            self.outputs[src.name] = pb
                    if pb is None:
                        # typed fetch failure: carries the producer stage id
                        # so the graph can roll back precisely
                        # (error.rs:58 FetchFailed payload)
                        from ..errors import fetch_failed
                        raise fetch_failed(
                            "", int(src.name), [],
                            f"stage {src.name} outputs lost and no spill")
                inputs[lid] = pb
            out, overflow, op_rows, ex_counts = fn(inputs)
            if not bool(jnp.any(overflow)):
                self.outputs[str(stage_id)] = out
                if self.spiller is not None:
                    self.spiller.spill(self.job_id, stage_id, out)
                self.op_metrics[stage_id] = {
                    lbl: int(v) for lbl, v in zip(
                        op_labels, __import__("numpy").asarray(op_rows).sum(axis=0))
                } if op_labels else {}
                return
            if attempt == max_quota_retries - 1:
                # terminal overflow still carries the shuffle-write stats:
                # a scheduler one process up can size the retry from them
                # (cross-process PartitionStats, serde/scheduler/mod.rs:33)
                import numpy as _np
                err = ShuffleOverflowError(
                    f"stage {stage_id} quota exceeded after retries")
                counts = _np.asarray(ex_counts)  # (shards, E, P)
                err.stats = [
                    {"quota": q, "salt_kind": kind,
                     "counts": counts[:, e, :]}
                    for e, (q, kind) in enumerate(ex_meta)] if ex_meta \
                    else None
                raise err
            # re-plan the whole job, sizing from the observed shuffle-write
            # stats when available (PartitionStats analog); downstream
            # stages pick up the larger capacities (consumer schemas change)
            from .runtime import escalate_overflow_opts
            err = ShuffleOverflowError("stats carrier")
            import numpy as _np
            counts = _np.asarray(ex_counts)  # (shards, E, P)
            err.stats = [
                {"quota": q, "salt_kind": kind, "counts": counts[:, e, :]}
                for e, (q, kind) in enumerate(ex_meta)] if ex_meta else None
            opts = escalate_overflow_opts(self.runtime.opts, err, attempt)
            self.runtime.opts = opts
            planner = DistributedPlanner(self.ctx, opts)
            self.dplan = planner.plan(self.logical_plan)
            self.stage_by_id = {s.stage_id: s for s in self.dplan.stages}
            self.outputs.clear()  # capacities changed; recompute deps
            for dep in range(stage_id):
                if dep in self.stage_by_id:
                    self.run_stage(dep, 1)

    def final_batch(self):
        return (gather_partitions(self.outputs[str(self.dplan.final_stage)],
                                  self.dplan.final_schema),
                self.dplan.final_schema)


class StandaloneCluster:
    """In-process scheduler + mesh executor (BallistaContext::standalone)."""

    def __init__(self, ctx, mesh=None, options: Optional[DistOptions] = None,
                 task_slots: int = 4, work_dir: Optional[str] = None,
                 policy: str = "push"):
        from .server import PollLoopExecutor

        self.ctx = ctx
        self.runtime = DistributedRuntime(ctx, mesh, options)
        self.launcher = MeshTaskLauncher(self.runtime)
        self.scheduler = SchedulerServer(self.launcher, policy=policy)
        self.launcher.scheduler = self.scheduler
        meta = ExecutorMetadata("mesh-executor-0", task_slots=task_slots)
        self.poll_executor = None
        if policy == "pull":
            # pull-staged: the executor claims work via PollWork instead of
            # the scheduler pushing LaunchTask (execution_loop.rs:56)
            self.poll_executor = PollLoopExecutor(
                self.scheduler, self.launcher, meta)
        else:
            self.scheduler.register_executor(meta)
        self.spiller = None
        if work_dir is not None:
            from .spill import StageSpiller
            self.spiller = StageSpiller(work_dir)

    def submit_sql(self, sql: str) -> str:
        df = self.ctx.sql(sql)
        return self.submit_plan(df.plan)

    def submit_plan(self, plan) -> str:
        from ..client.context import _rebind_scans

        plan = _rebind_scans(plan, self.ctx)
        from ..planner.optimizer import prune_columns, reduce_group_keys
        plan = prune_columns(reduce_group_keys(plan))
        planner = DistributedPlanner(self.ctx, self.runtime.opts)
        dplan = planner.plan(plan)
        job_id = random_job_id()
        self.launcher.jobs[job_id] = JobContext(
            job_id, dplan, self.runtime, self.ctx, plan,
            spiller=self.spiller)
        graph = ExecutionGraph.from_distributed_plan(
            job_id, dplan, self.runtime.opts.n_partitions)
        # planning warnings ride the job status (WarningCollector parity:
        # the reference propagates session warnings into JobStatus)
        graph.warnings = self.ctx.take_warnings()
        self.scheduler.submit_job(graph)
        return job_id

    def wait(self, job_id: str):
        """Pump the scheduler until the job reaches a terminal state, then
        return (Batch, Schema) (DistributedQueryExec's poll loop analog —
        no polling needed single-controller)."""
        if self.poll_executor is not None:
            self.poll_executor.run_until_drained()
        self.scheduler.run_until_idle()
        g = self.scheduler.task_manager.jobs[job_id]
        if g.state is not JobState.SUCCESSFUL:
            raise RuntimeError(f"job {job_id} {g.state.value}: {g.error}")
        return self.launcher.jobs[job_id].final_batch()

    def sql(self, query: str):
        """Submit + wait; returns a pandas DataFrame."""
        from .. import batch as B

        job_id = self.submit_sql(query)
        batch, schema = self.wait(job_id)
        return B.to_pandas(batch, schema)

    def job_status(self, job_id: str) -> dict:
        return self.scheduler.job_status(job_id)
