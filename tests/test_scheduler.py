"""Scheduler control-plane tests with virtual executors — the deterministic
zero-device harness the reference builds its most important suite on
(SchedulerTest + VirtualTaskLauncher + mock completions, SURVEY.md §4.3-4.4).
"""

import pytest

from ballista_tpu.scheduler.execution_graph import (
    ExecutionGraph, JobState, StageState, TASK_MAX_FAILURES,
    STAGE_MAX_FAILURES, TaskStatus)
from ballista_tpu.scheduler.server import (ExecutorMetadata, SchedulerServer,
                                           TaskLauncher)


def diamond_graph(job_id="job1", parts=4):
    # 0 -> 2, 1 -> 2, 2 -> 3 (two scans feeding a join stage, then merge)
    return ExecutionGraph(job_id, [
        (0, parts, []), (1, parts, []), (2, parts, [0, 1]), (3, 1, [2]),
    ])


def ok(task, error=None):
    return TaskStatus(task.task_id, task.job_id, task.stage_id,
                      task.partitions, task.executor_id, "successful")


def fail(task, error="boom"):
    return TaskStatus(task.task_id, task.job_id, task.stage_id,
                      task.partitions, task.executor_id, "failed", error)


def fetch_fail(task, input_stage, error="fetch"):
    return TaskStatus(task.task_id, task.job_id, task.stage_id,
                      task.partitions, task.executor_id, "fetch_failed",
                      error, failed_input_stage=input_stage)


def drain(graph, executor="e1", fail_first_of_stage=None):
    """drain_tasks analog (execution_graph.rs tests): pop every task and
    feed mock completions until no work remains."""
    failed_once = set()
    while True:
        task = graph.pop_next_task(executor)
        if task is None:
            break
        if fail_first_of_stage == task.stage_id and \
                task.stage_id not in failed_once:
            failed_once.add(task.stage_id)
            graph.update_task_status([fail(task)])
        else:
            graph.update_task_status([ok(task)])
    return graph


class TestExecutionGraph:
    def test_happy_path(self):
        g = diamond_graph()
        assert g.stages[0].state is StageState.RUNNING
        assert g.stages[2].state is StageState.UNRESOLVED
        drain(g)
        assert g.state is JobState.SUCCESSFUL
        assert all(s.state is StageState.SUCCESSFUL for s in g.stages.values())

    def test_multi_partition_task_group(self):
        g = diamond_graph(parts=8)
        t = g.pop_next_task("e1", max_partitions=3)
        assert t.stage_id == 0 and len(t.partitions) == 3
        t2 = g.pop_next_task("e2", max_partitions=8)
        assert t2.stage_id == 0 and len(t2.partitions) == 5

    def test_stage_resolution_gating(self):
        g = diamond_graph()
        # stage 2 must not hand out tasks until 0 and 1 complete
        seen = set()
        while True:
            t = g.pop_next_task("e1")
            if t is None:
                break
            seen.add(t.stage_id)
            g.update_task_status([ok(t)])
            if g.stages[0].state is not StageState.SUCCESSFUL or \
               g.stages[1].state is not StageState.SUCCESSFUL:
                assert 2 not in seen

    def test_task_retry_within_limit(self):
        g = diamond_graph()
        t = g.pop_next_task("e1")
        g.update_task_status([fail(t)])
        assert g.state is JobState.RUNNING  # retryable
        drain(g)
        assert g.state is JobState.SUCCESSFUL

    def test_task_failure_limit_fails_job(self):
        g = diamond_graph()
        for i in range(TASK_MAX_FAILURES + 1):
            t = g.pop_next_task("e1")
            g.update_task_status([fail(t)])
        assert g.state is JobState.FAILED
        assert "task failures" in g.error

    def test_fetch_failure_rolls_back_and_reruns_producer(self):
        g = diamond_graph()
        # complete stages 0 and 1
        while g.stages[0].state is not StageState.SUCCESSFUL or \
                g.stages[1].state is not StageState.SUCCESSFUL:
            t = g.pop_next_task("e1")
            assert t.stage_id in (0, 1)
            g.update_task_status([ok(t)])
        # stage 2 starts, then reports it couldn't read stage 0's output
        t = g.pop_next_task("e1")
        assert t.stage_id == 2
        g.update_task_status([fetch_fail(t, input_stage=0)])
        assert g.stages[2].state is StageState.UNRESOLVED
        assert g.stages[0].state is StageState.RUNNING  # re-running lost parts
        drain(g)
        assert g.state is JobState.SUCCESSFUL

    def test_consecutive_stage_failures_fail_job(self):
        g = diamond_graph()
        for _ in range(STAGE_MAX_FAILURES + 1):
            if g.state is JobState.FAILED:
                break
            while True:
                t = g.pop_next_task("e1")
                if t is None:
                    break
                if t.stage_id == 2:
                    g.update_task_status([fetch_fail(t, input_stage=0)])
                    break
                g.update_task_status([ok(t)])
        assert g.state is JobState.FAILED

    def test_executor_loss_resets_stages(self):
        g = diamond_graph()
        # e1 completes stage 0, e2 completes stage 1
        while True:
            t = g.pop_next_task("e1" if len(
                [1 for ti in g.stages[0].task_infos if ti is None]) else "e2")
            if t is None or t.stage_id == 2:
                break
            g.update_task_status([ok(t)])
        assert g.stages[0].state is StageState.SUCCESSFUL
        affected = g.reset_stages_on_lost_executor("e1")
        assert 0 in affected
        assert g.stages[0].state is StageState.RUNNING
        # stage 2 rolled back since its input went missing
        assert g.stages[2].state is StageState.UNRESOLVED
        drain(g, "e2")
        assert g.state is JobState.SUCCESSFUL

    def test_delayed_success_after_rollback_ignored(self):
        """Race: a stale success arrives for a stage already rolled back
        (test_long_delayed_fetch_failures_race_condition analog,
        execution_graph.rs:2576)."""
        g = diamond_graph()
        t0 = g.pop_next_task("e1")
        g.reset_stages_on_lost_executor("e1")
        g.update_task_status([ok(t0)])  # stale: task ids won't match
        assert g.stages[t0.stage_id].successful_partitions <= len(t0.partitions)
        drain(g, "e2")
        assert g.state is JobState.SUCCESSFUL


class VirtualLauncher(TaskLauncher):
    """Sends tasks to virtual executors that complete instantly
    (VirtualTaskLauncher, test_utils.rs:357)."""

    def __init__(self, behavior=None):
        self.launched = []
        self.behavior = behavior or (lambda task: ok(task))

    def launch(self, tasks, report):
        self.launched.extend(tasks)
        report([self.behavior(t) for t in tasks])


class TestSchedulerServer:
    def test_push_scheduling_completes_job(self):
        launcher = VirtualLauncher()
        s = SchedulerServer(launcher)
        s.register_executor(ExecutorMetadata("e1", task_slots=2))
        s.register_executor(ExecutorMetadata("e2", task_slots=2))
        g = diamond_graph()
        s.submit_job(g)
        s.run_until_idle()
        assert g.state is JobState.SUCCESSFUL
        # all 4 executors' slots returned
        assert all(e.free_slots == e.meta.task_slots
                   for e in s.executor_manager.executors.values())

    def test_round_robin_across_jobs(self):
        launcher = VirtualLauncher()
        s = SchedulerServer(launcher)
        s.register_executor(ExecutorMetadata("e1", task_slots=1))
        g1 = diamond_graph("job1")
        g2 = diamond_graph("job2")
        s.submit_job(g1)
        s.submit_job(g2)
        s.run_until_idle()
        assert g1.state is JobState.SUCCESSFUL
        assert g2.state is JobState.SUCCESSFUL
        jobs_in_order = [t.job_id for t in launcher.launched]
        assert "job1" in jobs_in_order and "job2" in jobs_in_order

    def test_statuses_from_dead_executor_dropped(self):
        launcher = VirtualLauncher()
        s = SchedulerServer(launcher)
        s.register_executor(ExecutorMetadata("e1", task_slots=4))
        g = diamond_graph()
        s.submit_job(g)
        s.run_until_idle()
        s.executor_lost("zombie")
        before = g.status()
        s.update_task_status("zombie", [TaskStatus(
            999, "job1", 0, (0,), "zombie", "failed", "late")])
        s.run_until_idle()
        assert g.status() == before

    def test_executor_expiry_sweep(self):
        launcher = VirtualLauncher()
        s = SchedulerServer(launcher, executor_timeout_s=0.0)
        s.register_executor(ExecutorMetadata("e1", task_slots=1))
        import time
        time.sleep(0.01)
        s.expire_dead_executors()
        assert "e1" not in s.executor_manager.executors
        assert s.executor_manager.is_dead("e1")

    def test_keda_metrics(self):
        launcher = VirtualLauncher()
        s = SchedulerServer(launcher)
        g = diamond_graph()
        s.submit_job(g)
        assert s.is_active()
        assert s.pending_task_count() > 0
        s.register_executor(ExecutorMetadata("e1", task_slots=8))
        s.run_until_idle()
        assert not s.is_active()
        assert s.pending_task_count() == 0


class TestLifecycle:
    """CancelJob + graceful executor termination (grpc.rs:523,496;
    executor_server.rs:1157)."""

    def test_cancel_running_job(self):
        class Blackhole(TaskLauncher):  # tasks never complete
            def launch(self, tasks, report):
                pass

        s = SchedulerServer(Blackhole())
        s.register_executor(ExecutorMetadata("e1", task_slots=4))
        g = diamond_graph()
        s.submit_job(g)
        s.run_until_idle()
        assert g.state is JobState.RUNNING
        assert s.cancel_job("job1")
        assert g.state is JobState.CANCELLED
        # cancelling again / unknown job is a no-op
        assert not s.cancel_job("job1")
        assert not s.cancel_job("nope")
        # late statuses for the cancelled job are ignored, slots return
        s.update_task_status("e1", [TaskStatus(
            0, "job1", 0, (0, 1, 2, 3), "e1", "successful")])
        s.run_until_idle()
        assert g.state is JobState.CANCELLED

    def test_graceful_stop_drains_then_removes(self):
        launcher = VirtualLauncher()
        s = SchedulerServer(launcher)
        s.register_executor(ExecutorMetadata("e1", task_slots=4))
        s.stop_executor("e1")
        from ballista_tpu.scheduler.server import ExecutorStatus
        assert (s.executor_manager.executors["e1"].status
                is ExecutorStatus.TERMINATING)
        # TERMINATING executors receive no new work
        g = diamond_graph()
        s.submit_job(g)
        s.run_until_idle()
        assert not launcher.launched
        assert s.poll_work("e1", 4) == []  # pull path refuses it too
        s.executor_stopped("e1")
        s.run_until_idle()
        assert "e1" not in s.executor_manager.executors
        assert s.executor_manager.is_dead("e1")
        # a fresh executor picks the job up
        s.register_executor(ExecutorMetadata("e2", task_slots=4))
        s.run_until_idle()
        assert g.state is JobState.SUCCESSFUL


class TestPullScheduling:
    """Pull-staged mode (PollWork, grpc.rs:82 + execution_loop.rs:56): the
    scheduler never pushes; executors claim work by polling."""

    def test_poll_loop_completes_job(self):
        from ballista_tpu.scheduler.server import PollLoopExecutor
        launcher = VirtualLauncher()
        s = SchedulerServer(launcher, policy="pull")
        ex = PollLoopExecutor(s, launcher, ExecutorMetadata("e1", task_slots=2))
        g = diamond_graph()
        s.submit_job(g)
        # pull mode: submit alone launches nothing
        s.run_until_idle()
        assert not launcher.launched
        ex.run_until_drained()
        assert g.state is JobState.SUCCESSFUL

    def test_poll_claims_at_most_free_slots(self):
        launcher = VirtualLauncher()
        s = SchedulerServer(launcher, policy="pull")
        s.register_executor(ExecutorMetadata("e1", task_slots=4))
        g = diamond_graph(parts=8)
        s.submit_job(g)
        # two runnable stages (0, 1) -> two multi-partition task groups;
        # a 1-slot poll claims only one of them
        tasks = s.poll_work("e1", 1)
        assert len(tasks) == 1
        assert s.poll_work("e1", 0) == []
        tasks2 = s.poll_work("e1", 3)
        assert len(tasks2) == 1  # the other runnable stage

    def test_poll_from_unknown_or_dead_executor(self):
        launcher = VirtualLauncher()
        s = SchedulerServer(launcher, policy="pull")
        s.submit_job(diamond_graph())
        assert s.poll_work("ghost", 4) == []
        s.register_executor(ExecutorMetadata("e1", task_slots=4))
        s.executor_lost("e1")
        assert s.poll_work("e1", 4) == []

    def test_poll_statuses_drive_stage_resolution(self):
        launcher = VirtualLauncher()
        s = SchedulerServer(launcher, policy="pull")
        s.register_executor(ExecutorMetadata("e1", task_slots=16))
        g = diamond_graph()
        s.submit_job(g)
        tasks = s.poll_work("e1", 16)
        assert {t.stage_id for t in tasks} == {0, 1}
        # completing stages 0+1 via the next poll resolves stage 2
        done = [ok(t) for t in tasks]
        tasks2 = s.poll_work("e1", 16, done)
        assert {t.stage_id for t in tasks2} == {2}

    def test_pull_retry_on_failure(self):
        from ballista_tpu.scheduler.server import PollLoopExecutor
        failed_once = []

        def flaky(task):
            if task.stage_id == 2 and not failed_once:
                failed_once.append(task)
                return fail(task)
            return ok(task)

        launcher = VirtualLauncher(flaky)
        s = SchedulerServer(launcher, policy="pull")
        ex = PollLoopExecutor(s, launcher, ExecutorMetadata("e1", task_slots=4))
        g = diamond_graph()
        s.submit_job(g)
        ex.run_until_drained()
        assert g.state is JobState.SUCCESSFUL
        assert len(failed_once) == 1

    def test_two_pull_executors_share_work(self):
        from ballista_tpu.scheduler.server import PollLoopExecutor
        seen = {}

        class Tracking(VirtualLauncher):
            def launch(self, tasks, report):
                for t in tasks:
                    seen.setdefault(t.executor_id, []).append(t)
                super().launch(tasks, report)

        launcher = Tracking()
        s = SchedulerServer(launcher, policy="pull")
        # 1 slot each: the two initially-runnable stages (0 and 1) must
        # land on different executors
        e1 = PollLoopExecutor(s, launcher, ExecutorMetadata("e1", task_slots=1))
        e2 = PollLoopExecutor(s, launcher, ExecutorMetadata("e2", task_slots=1))
        g = diamond_graph(parts=8)
        s.submit_job(g)
        # interleave polls until drained
        for _ in range(200):
            n = e1.poll_once() + e2.poll_once()
            if n == 0 and not s.has_pending_work():
                break
        assert g.state is JobState.SUCCESSFUL
        assert set(seen) == {"e1", "e2"}


class TestCircuitBreaker:
    def test_trip_stage_preempts_remaining_partitions(self):
        """Circuit-breaker trip (execution_graph.rs:1510 parity): a stage
        whose global row limit is satisfied completes without running its
        remaining partitions."""
        g = diamond_graph(parts=4)
        t = g.pop_next_task("e1", max_partitions=1)  # 1 of 4 scheduled
        g.update_task_status([ok(t)])
        events = g.trip_stage(0)
        from ballista_tpu.scheduler.execution_graph import (JobEvent,
                                                            StageState)
        assert g.stages[0].state is StageState.SUCCESSFUL
        assert JobEvent.STAGE_COMPLETED in events
        # synthesized completions carry the circuit-breaker marker
        markers = [ti.executor_id for ti in g.stages[0].task_infos]
        assert markers.count("<circuit-breaker>") == 3
        drain(g)
        from ballista_tpu.scheduler.execution_graph import JobState
        assert g.state is JobState.SUCCESSFUL

    def test_controller_aggregates_and_trips(self):
        """CircuitBreakerController (controller.rs:15 parity): percents sum
        across partitions; ≥1.0 trips once; late updates don't re-trip."""
        from ballista_tpu.scheduler.server import CircuitBreakerController
        cb = CircuitBreakerController()
        assert cb.update([("j1", "s", 2, 0, 0, 0.4),
                          ("j1", "s", 2, 0, 1, 0.3)]) == []
        assert not cb.is_tripped("j1", "s")
        # partition 0 re-reports a higher percent (max, not sum, per part)
        trips = cb.update([("j1", "s", 2, 0, 0, 0.7)])
        assert trips == [("j1", "s", 2, 0)]
        assert cb.is_tripped("j1", "s")
        assert cb.update([("j1", "s", 2, 0, 2, 0.9)]) == []  # sticky
        cb.clean_job("j1")
        assert not cb.is_tripped("j1", "s")

    def test_scheduler_update_trips_running_stage(self):
        """SendCircuitBreakerUpdate path (grpc.rs:559): a running stage is
        preempted when the controller trips its key."""
        from ballista_tpu.scheduler.server import (ExecutorMetadata,
                                                   SchedulerServer)
        class Blackhole(VirtualLauncher):  # test_utils.rs:335 — never reports
            def launch(self, tasks, report):
                self.launched.extend(tasks)

        launcher = Blackhole()
        s = SchedulerServer(launcher)
        s.register_executor(ExecutorMetadata("e1", task_slots=2))
        g = diamond_graph(parts=4)
        s.submit_job(g)
        s.run_until_idle()
        # stage 0 running, ≤2 partitions scheduled (2 slots); limit reached:
        trips = s.send_circuit_breaker_update(
            [(g.job_id, "lim", 0, 0, 0, 1.0)])
        assert trips
        from ballista_tpu.scheduler.execution_graph import StageState
        assert g.stages[0].state is StageState.SUCCESSFUL


class TestJobStorePersistence:
    """ExecutionGraph persistence + scheduler-restart takeover — the
    reference persists graphs via JobState (cluster/mod.rs:346) but leaves
    try_acquire_job unimplemented (kv.rs:697); recover_jobs implements it."""

    def test_graph_round_trip(self):
        g = diamond_graph()
        # advance partway: finish stage 0 entirely, schedule one stage-1 task
        while True:
            t = g.pop_next_task("e1", max_partitions=2)
            if t is None or t.stage_id != 0:
                break
            g.update_task_status([ok(t)])
        t1 = g.pop_next_task("e1", max_partitions=1)
        d = g.to_dict()
        g2 = ExecutionGraph.from_dict(d)
        assert g2.status() == g.status()
        assert g2._next_task_id == g._next_task_id
        assert g2.stages[0].state is StageState.SUCCESSFUL
        assert g2.stages[0].output_locations == g.stages[0].output_locations

    def test_file_store_recovery_resumes_job(self, tmp_path):
        from ballista_tpu.scheduler.job_store import FileJobStore

        store = FileJobStore(str(tmp_path))
        # scheduler 1: blackhole launcher (tasks vanish — scheduler dies
        # mid-flight with stage 0 scheduled but unfinished)
        class Blackhole(TaskLauncher):
            def launch(self, tasks, report):
                pass

        s1 = SchedulerServer(Blackhole(), job_store=store)
        s1.register_executor(ExecutorMetadata("e1", task_slots=8))
        g = diamond_graph("jobr")
        s1.submit_job(g)
        s1.run_until_idle()
        assert g.state is JobState.RUNNING  # stuck: tasks never complete
        assert store.get_job("jobr") is not None

        # scheduler 2 takes over from the store and finishes the job
        launcher = VirtualLauncher()
        s2 = SchedulerServer(launcher, job_store=store)
        s2.register_executor(ExecutorMetadata("e2", task_slots=8))
        recovered = s2.recover_jobs()
        assert recovered == ["jobr"]
        s2.run_until_idle()
        g2 = s2.task_manager.jobs["jobr"]
        assert g2.state is JobState.SUCCESSFUL
        # terminal state persisted
        from ballista_tpu.scheduler.execution_graph import ExecutionGraph as EG
        assert EG.from_dict(store.get_job("jobr")["graph"]).state \
            is JobState.SUCCESSFUL

    def test_terminal_jobs_not_recovered(self, tmp_path):
        from ballista_tpu.scheduler.job_store import FileJobStore

        store = FileJobStore(str(tmp_path))
        s1 = SchedulerServer(VirtualLauncher(), job_store=store)
        s1.register_executor(ExecutorMetadata("e1", task_slots=8))
        s1.submit_job(diamond_graph("done1"))
        s1.run_until_idle()
        s2 = SchedulerServer(VirtualLauncher(), job_store=store)
        assert s2.recover_jobs() == []


class TestSchedulerEventBench:
    def test_event_bench_completes_all_jobs(self):
        """The scheduler event-loop micro-bench (scheduler_events.rs
        analog) is itself a correctness harness: every submitted job must
        reach SUCCESSFUL through the real event pump."""
        from ballista_tpu.benchmarks.scheduler_events import bench_inproc
        out = bench_inproc(20, 4, 8, 2)
        assert out["jobs_per_s"] > 0 and out["events_per_s"] > 0
