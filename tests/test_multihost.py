"""Multi-host execution: 2 coordinated processes, one global 8-device mesh.

Reference parity: the multi-executor deployment (scheduler + N executors,
SURVEY.md §7 step 7) — here JAX multi-controller SPMD over jax.distributed;
shuffle traffic crosses the process boundary through collectives instead
of Flight streams. Each worker registers identical data (deterministic
datagen), runs the same distributed plan, and checks against a pandas
oracle; see tests/multihost_worker.py.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn_pair(scenario: str = "basic", extra_env: dict | None = None,
                timeout: int = 540):
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(__file__))
                         + os.pathsep + env.get("PYTHONPATH", ""))
    # workers set their own platform/device-count config
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env.update(extra_env or {})
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(pid), "2", str(port), scenario],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    return procs, outs


def test_two_process_global_mesh():
    procs, outs = _spawn_pair()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"RESULT_OK p{pid}" in out, out[-3000:]


def test_salted_shuffle_across_hosts():
    """Hot-key join under a tight quota: the overflow retry must pick the
    SAME stats-driven salt on every process (the per-dest counts come off
    global collectives, so they agree) and the salted exchange crosses
    the process boundary row-exactly."""
    procs, outs = _spawn_pair("skew")
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"RESULT_OK p{pid}" in out, out[-3000:]


def test_killed_worker_detected_and_job_rerun_succeeds():
    """The recovery story for a lost worker (executor loss,
    execution_graph.rs:1130 / executor_manager.rs:450 parity): worker 1
    dies hard before dispatching; worker 0's watchdog (heartbeat-expiry
    analog) detects the stall instead of hanging, and the controller —
    here the test — restarts the job on a fresh pair, which completes.
    JAX SPMD collectives are gang-scheduled, so single-controller restart
    (job_store.recover_jobs) is the documented recovery path rather than
    per-task re-execution."""
    procs, outs = _spawn_pair(
        "basic", {"BALLISTA_CRASH_WORKER": "1", "BALLISTA_PEER_TIMEOUT": "90"},
        timeout=300)
    assert procs[1].returncode == 17, outs[1][-2000:]   # the killed worker
    # the survivor must NOT hang or report success: either its watchdog
    # fired (3) or the collective layer surfaced the dead peer (nonzero)
    assert procs[0].returncode != 0, outs[0][-2000:]
    assert "RESULT_OK p0" not in outs[0]
    # controller-level recovery: re-run the job on a fresh worker pair
    procs, outs = _spawn_pair()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rerun worker {pid} failed:\n{out[-3000:]}"
        assert f"RESULT_OK p{pid}" in out, out[-3000:]
