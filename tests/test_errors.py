"""Error taxonomy: classification + fail-fast semantics
(BallistaError, core/src/error.rs:44; ExecutionError, ballista.proto:603)."""

import pytest

from ballista_tpu.errors import BallistaError, classify, fetch_failed


def test_classify_mapping():
    assert classify(NotImplementedError("x")).kind == "not_implemented"
    assert classify(OSError("disk")).kind == "io"
    assert classify(MemoryError()).kind == "resource_exhausted"
    assert classify(ValueError("bad plan")).kind == "planning"
    assert classify(RuntimeError("huh")).kind == "general"
    from ballista_tpu.scheduler.runtime import ShuffleOverflowError
    assert classify(ShuffleOverflowError("q")).kind == "shuffle_overflow"
    # already-classified passes through
    e = BallistaError("internal", "z")
    assert classify(e) is e


def test_retryable_split():
    assert BallistaError("io", "x").retryable
    assert BallistaError("fetch_failed", "x").retryable
    assert not BallistaError("planning", "x").retryable
    assert not BallistaError("not_implemented", "x").retryable
    assert "planning" in BallistaError.PERMANENT
    assert "general" not in BallistaError.PERMANENT


def test_wire_roundtrip():
    e = fetch_failed("exec-2", 3, [0, 2], "lost")
    d = e.to_dict()
    r = BallistaError.from_dict(d)
    assert (r.kind, r.executor_id, r.map_stage_id, r.map_partitions) == \
        ("fetch_failed", "exec-2", 3, [0, 2])
    assert "map_stage=3" in str(r)


def test_graph_fails_fast_on_permanent_kind():
    """A non-retryable classified failure fails the job on the FIRST
    attempt; an unclassified failure still gets bounded retries."""
    from ballista_tpu.scheduler.execution_graph import (ExecutionGraph,
                                                        GraphStage, JobState,
                                                        TaskStatus)

    def one_stage_graph():
        g = ExecutionGraph("j1", [(0, 2, ())])
        g.stages[0].state = type(g.stages[0].state).RUNNING
        from ballista_tpu.scheduler.execution_graph import TaskInfo
        g.stages[0].task_infos = [TaskInfo(0, 0, "e1", 0.0),
                                  TaskInfo(0, 1, "e1", 0.0)]
        return g

    g = one_stage_graph()
    g.update_task_status([TaskStatus(0, "j1", 0, (0, 1), "e1", "failed",
                                     "planning: bad", error_kind="planning")])
    assert g.state is JobState.FAILED
    assert "permanently" in g.error

    g2 = one_stage_graph()
    g2.update_task_status([TaskStatus(0, "j1", 0, (0, 1), "e1", "failed",
                                      "io: flake", error_kind="io")])
    assert g2.state is not JobState.FAILED  # retryable kind -> rescheduled
