"""Deployable executor worker: the executor_process binary.

Reference parity: `executor/src/executor_process.rs` (start-up, scheduler
registration, heartbeats, work loop, graceful shutdown) combined with the
pull-mode execution loop (`executor/src/execution_loop.rs:56`): the worker
registers with the scheduler over the RPC wire (scheduler/rpc.py), polls
for tasks, executes each stage-task on its local device mesh, exchanges
stage data with other executors through the shared object store
(scheduler/spill.py — the Replicator/shuffle-file transport), and reports
TaskStatus on the next poll.

Usage:
  python -m ballista_tpu.scheduler.executor_process \
      --scheduler http://host:port [--executor-id ID] [--slots N] \
      [--devices N] [--poll-ms 100] [--heartbeat-s 10]

SIGTERM triggers the graceful-stop protocol: finish the in-flight task,
flush its status, notify ExecutorStopped, exit 0 (executor_process.rs's
TERMINATING grace path).
"""

from __future__ import annotations

import collections
import json
import logging
import os
import signal
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional

log = logging.getLogger("ballista_tpu.executor")


def fetch_stage_blob(host: str, port: int, job_id: str, stage_id: int,
                     version: int, timeout: float = 60.0) -> Optional[bytes]:
    """Dial a peer executor's data endpoint for one stage's spill blob
    (the FetchPartition do_get ticket, flight_service.rs:123). None on
    any failure — the caller decides which tier to try next."""
    import urllib.request
    if not port:
        return None
    data = json.dumps({"job_id": job_id, "stage_id": int(stage_id),
                       "spec_version": int(version)}).encode()
    req = urllib.request.Request(
        f"http://{host}:{port}/exec/fetch_partition", data=data,
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return resp.read()
    except Exception as e:  # noqa: BLE001 - peer gone / partition missing
        log.debug("peer fetch %s:%s %s/stage_%s failed: %s",
                  host, port, job_id, stage_id, e)
        return None


class _ExecutorJob:
    """Executor-side job state: context, deterministically re-derived stage
    programs, and the spiller (one per (job, spec version)). The spiller
    targets the executor's LOCAL work dir when one is configured (peer-to-
    peer deployments, shuffle files stay with their producer) and the
    job's shared work_dir otherwise."""

    def __init__(self, spec, mesh, work_dir=None, peer_fetch=None):
        from ..client.context import _rebind_scans
        from ..planner.optimizer import prune_columns, reduce_group_keys
        from ..serde.tasks import build_context
        from .distributed_planner import DistributedPlanner
        from .runtime import DistributedRuntime
        from .spill import StageSpiller
        from .standalone import JobContext

        self.spec = spec
        ctx = build_context(spec.tables)
        plan = prune_columns(reduce_group_keys(
            _rebind_scans(spec.plan, ctx)))
        runtime = DistributedRuntime(ctx, mesh, spec.options)
        dplan = DistributedPlanner(ctx, spec.options).plan(plan)
        self.jc = JobContext(spec.job_id, dplan, runtime, ctx, plan,
                             spiller=StageSpiller(work_dir or spec.work_dir,
                                                  version=spec.version),
                             peer_fetch=peer_fetch)


class ExecutorProcess:
    def __init__(self, scheduler_url: str, executor_id: str,
                 task_slots: int = 1, mesh=None, poll_interval: float = 0.1,
                 heartbeat_interval: float = 10.0, work_dir: str = None):
        from ..parallel.mesh import make_mesh
        from .rpc import SchedulerRpcClient
        from .server import ExecutorMetadata

        self.client = SchedulerRpcClient(scheduler_url)
        self.mesh = mesh or make_mesh()
        self.meta = ExecutorMetadata(executor_id, task_slots=task_slots,
                                     devices=int(self.mesh.devices.size))
        self.poll_interval = poll_interval
        self.heartbeat_interval = heartbeat_interval
        # executor-LOCAL shuffle dir: when set, stage outputs spill here
        # (not the job's shared work_dir) and peers fetch them over the
        # data endpoint — the reference's per-executor work_dir +
        # FlightRemote read (executor_process.rs work_dir flag,
        # shuffle_reader.rs:226)
        self.work_dir = work_dir
        self.jobs: Dict[str, _ExecutorJob] = {}
        self._statuses: List = []
        self._stop = threading.Event()
        self._hb_thread: Optional[threading.Thread] = None

    # -- lifecycle --
    def start(self):
        self.client.register_executor(self.meta)
        log.info("executor %s registered at %s (%d devices, %d slots)",
                 self.meta.executor_id, self.client.url,
                 self.mesh.devices.size, self.meta.task_slots)
        # the launcher-visible readiness marker MUST follow registration
        # (tests and process managers wait on it)
        print(f"EXECUTOR_READY {self.meta.executor_id}", flush=True)
        self._hb_thread = threading.Thread(target=self._heartbeat_loop,
                                           daemon=True)
        self._hb_thread.start()

    def _heartbeat_loop(self):
        """Heartbeater (executor/src/executor_server.rs heartbeat task):
        keeps the executor alive in the scheduler's registry while a long
        stage program occupies the poll thread."""
        while not self._stop.wait(self.heartbeat_interval):
            try:
                out = self.client.heartbeat(self.meta.executor_id, metrics={
                    "cached_jobs": len(self.jobs),
                    "pending_statuses": len(self._statuses)})
                if out is not None and out.get("known") is False:
                    # scheduler restarted or expired us: re-register so
                    # work flows again (a worker that only polls idle
                    # would otherwise be excluded forever — ADVICE r3)
                    self._reregister()
            except Exception as e:  # noqa: BLE001 - scheduler may be down
                log.warning("heartbeat failed: %s", e)

    def _reregister(self):
        try:
            self.client.register_executor(self.meta)
            log.info("executor %s re-registered", self.meta.executor_id)
        except Exception as e:  # noqa: BLE001 - retried on next signal
            log.warning("re-registration failed: %s", e)

    def stop(self, graceful: bool = True):
        self._stop.set()
        if graceful:
            try:
                if self._statuses:
                    self.client.poll_work(self.meta.executor_id, 0,
                                          self._statuses)
                    self._statuses = []
                self.client.executor_stopped(self.meta.executor_id)
            except Exception as e:  # noqa: BLE001
                log.warning("graceful stop notification failed: %s", e)

    # -- work loop --
    def _job_for(self, task) -> _ExecutorJob:
        ej = self.jobs.get(task.job_id)
        want = getattr(task, "_spec_version", None)
        if ej is not None and (want is None or ej.spec.version >= want):
            return ej
        spec = self.client.get_job(task.job_id)
        if spec is None:
            raise RuntimeError(f"scheduler has no spec for {task.job_id}")
        if spec.options.n_partitions != self.mesh.devices.size:
            raise RuntimeError(
                f"job {task.job_id} plans {spec.options.n_partitions} "
                f"partitions but this executor's mesh has "
                f"{self.mesh.devices.size} devices")
        version = spec.version

        def peer_fetch(job_id, stage_id, mesh):
            return self._peer_fetch(job_id, stage_id, mesh, version)

        ej = _ExecutorJob(spec, self.mesh, work_dir=self.work_dir,
                          peer_fetch=peer_fetch)
        self.jobs[task.job_id] = ej
        return ej

    # -- peer-to-peer shuffle fetch (three-tier read, remote tier) --

    def _peer_fetch(self, job_id: str, stage_id: int, mesh, version: int):
        """Pull a stage output straight from its producing executor
        (shuffle_reader.rs:395-537 FlightRemote tier): ask the scheduler
        who produced it, dial that worker's data endpoint, decode the
        blob onto the local mesh. Returns None when no peer can serve it
        (the caller then falls through to fetch_failed → graph rollback)."""
        from .spill import decode_stage
        try:
            locs = self.client.stage_locations(job_id, stage_id)
        except Exception as e:  # noqa: BLE001 - scheduler hiccup
            log.warning("stage_locations(%s, %s) failed: %s",
                        job_id, stage_id, e)
            return None
        for loc in locs:
            if loc.get("executor_id") == self.meta.executor_id:
                continue    # local tiers already missed
            blob = fetch_stage_blob(loc["host"], loc["data_port"], job_id,
                                    stage_id, version)
            if blob is not None:
                log.info("fetched %s/stage_%s from peer %s (%d bytes)",
                         job_id, stage_id, loc["executor_id"], len(blob))
                return decode_stage(blob, mesh)
        return None

    def _fetch_partition_blob(self, req: dict) -> Optional[bytes]:
        """Serving side of the data endpoint (flight_service.rs:74 do_get
        FetchPartition): return the raw spill blob for (job, stage, spec
        version) from the cached job's spiller, the in-memory output, or
        a cold read of the local work dir."""
        from .spill import StageSpiller, encode_stage
        job_id = req["job_id"]
        stage_id = int(req["stage_id"])
        version = int(req.get("spec_version", 0))
        ej = self.jobs.get(job_id)
        if ej is not None and ej.spec.version == version:
            blob = ej.jc.spiller.read_blob(job_id, stage_id)
            if blob is not None:
                return blob
            pb = ej.jc.outputs.get(str(stage_id))
            if pb is not None:
                return encode_stage(pb)
        if self.work_dir:
            # job evicted but the shuffle file may still be on local disk
            return StageSpiller(self.work_dir,
                                version=version).read_blob(job_id, stage_id)
        return None

    def _run_task(self, task):
        from ..errors import BallistaError, classify
        from .execution_graph import TaskStatus

        try:
            ej = self._job_for(task)
            # max_quota_retries=1: an overflow must FAIL the task so the
            # scheduler escalates the job spec for every executor
            # coherently (rpc.py _escalate_on_overflow) — local silent
            # escalation would desync capacities across processes
            t0 = time.time()
            ej.jc.run_stage(task.stage_id, max_quota_retries=1)
            # operator metrics ride TaskStatus (OperatorMetricsSet,
            # proto:286-319): the scheduler merges them so a remote
            # fleet's per-operator timing is visible at /api/job/.../stages
            metrics = {"run_s": round(time.time() - t0, 4),
                       "operator_rows":
                           ej.jc.op_metrics.get(task.stage_id) or {}}
            return TaskStatus(task.task_id, task.job_id, task.stage_id,
                              task.partitions, self.meta.executor_id,
                              "successful", metrics=metrics)
        except Exception as e:  # noqa: BLE001 - all failures ride the wire
            err = classify(e)
            log.warning("task %s/%s failed (%s): %s", task.job_id,
                        task.stage_id, err.kind, err.message)
            self.jobs.pop(task.job_id, None)  # re-derive on retry
            if err.kind == "fetch_failed":
                return TaskStatus(task.task_id, task.job_id, task.stage_id,
                                  task.partitions, self.meta.executor_id,
                                  "fetch_failed", str(err),
                                  failed_input_stage=err.map_stage_id,
                                  error_kind=err.kind)
            # shuffle-write stats ride the failure wire (PartitionStats,
            # serde/scheduler/mod.rs:33): the scheduler sizes quota/salt
            # for ALL executors from the observed counts
            stats = None
            for st in (getattr(e, "stats", None) or ()):
                stats = (stats or [])
                stats.append({"quota": int(st["quota"]),
                              "salt_kind": st["salt_kind"],
                              "counts": [[int(x) for x in row] for row in
                                         st["counts"]]})
            return TaskStatus(task.task_id, task.job_id, task.stage_id,
                              task.partitions, self.meta.executor_id,
                              "failed", str(err), error_kind=err.kind,
                              stats=stats)

    def poll_once(self) -> int:
        statuses, self._statuses = self._statuses, []
        try:
            tasks, known = self.client.poll_work(
                self.meta.executor_id, self.meta.task_slots, statuses)
        except Exception as e:  # noqa: BLE001 - scheduler hiccup: retry
            log.warning("poll failed: %s", e)
            self._statuses = statuses  # redeliver next poll
            return 0
        if not known:
            self._reregister()
        for task in tasks:
            self._statuses.append(self._run_task(task))
        return len(tasks)

    def run_forever(self):
        self.start()
        while not self._stop.is_set():
            if self.poll_once() == 0:
                self._stop.wait(self.poll_interval)
        log.info("executor %s stopped", self.meta.executor_id)

    # -- executor HTTP service: push verbs + the data endpoint --

    def listen(self, host: str = "127.0.0.1", port: int = 0,
               advertise_host: str = None, data_only: bool = False):
        """Start the ExecutorGrpc-analog HTTP service (LaunchTask,
        CancelTasks, StopExecutor, RemoveJobData — executor_server.rs:1118,
        1157, 1183, 1210 — plus the Flight-shuffle-service analog
        fetch_partition, flight_service.rs:74) and advertise its endpoint
        in the registration metadata. Call BEFORE start() so the scheduler
        learns the port. `advertise_host` is the name the SCHEDULER (and
        peers) should dial when it differs from the bind address — the
        reference's executor external_host flag. `data_only=True` serves
        ONLY fetch_partition and does not advertise a push endpoint, so a
        pull-mode worker can hand out shuffle data without being
        push-launched at."""
        self._queue: collections.deque = collections.deque()
        self._queue_cond = threading.Condition()
        self._cancelled: set = set()
        proc = self

        class _ExecHandler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):
                log.debug("exec http: " + fmt, *args)

            def do_POST(self):
                verb = self.path.rstrip("/").rsplit("/", 1)[-1]
                n = int(self.headers.get("Content-Length", 0))
                try:
                    req = json.loads(self.rfile.read(n) or b"{}")
                    if verb == "fetch_partition":
                        blob = proc._fetch_partition_blob(req)
                        if blob is None:
                            self.send_error(404, "partition not found")
                            return
                        self.send_response(200)
                        self.send_header("Content-Type",
                                         "application/vnd.apache.arrow.file")
                        self.send_header("Content-Length", str(len(blob)))
                        self.end_headers()
                        self.wfile.write(blob)
                        return
                    if data_only:
                        self.send_error(403, "data-only endpoint")
                        return
                    resp = proc._push_verb(verb, req)
                    body = json.dumps(resp).encode()
                    self.send_response(200)
                except Exception as e:  # noqa: BLE001
                    body = json.dumps({"error": str(e)}).encode()
                    self.send_response(500)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self._httpd = ThreadingHTTPServer((host, port), _ExecHandler)
        self.meta.host = advertise_host or host
        self.meta.data_port = self._httpd.server_address[1]
        if not data_only:
            self.meta.port = self._httpd.server_address[1]
        threading.Thread(target=self._httpd.serve_forever,
                         daemon=True).start()
        return self._httpd.server_address[1]

    def _push_verb(self, verb: str, req: dict) -> dict:
        from ..serde.tasks import task_from_wire
        if verb == "launch_task":
            # rejected while TERMINATING (executor_server.rs:1118 rejects
            # LaunchTask during the drain grace period)
            if self._stop.is_set():
                return {"accepted": 0, "terminating": True}
            tasks = []
            for w in req.get("tasks", []):
                v = w.pop("spec_version", 0)
                t = task_from_wire(w)
                t._spec_version = v
                tasks.append(t)
            with self._queue_cond:
                self._queue.extend(tasks)
                self._queue_cond.notify_all()
            return {"accepted": len(tasks)}
        if verb == "cancel_tasks":
            with self._queue_cond:
                self._cancelled.add(req["job_id"])
                self._queue = collections.deque(
                    t for t in self._queue if t.job_id != req["job_id"])
            self.jobs.pop(req["job_id"], None)
            return {"ok": True}
        if verb == "stop_executor":
            self._stop.set()
            with self._queue_cond:
                self._queue_cond.notify_all()
            return {"ok": True}
        if verb == "remove_job_data":
            self.jobs.pop(req["job_id"], None)
            return {"ok": True}
        raise ValueError(f"unknown verb {verb}")

    def _flush_statuses(self):
        """Deliver pending task statuses via UpdateTaskStatus, keeping them
        queued on failure for the next attempt (push-mode analog of the
        pull loop's every-poll redelivery)."""
        if not self._statuses:
            return
        pending, self._statuses = self._statuses, []
        try:
            self.client.update_task_status(self.meta.executor_id, pending)
        except Exception as e:  # noqa: BLE001 - hold for retry
            log.warning("status delivery failed (%d held): %s",
                        len(pending), e)
            self._statuses = pending + self._statuses

    def run_push(self):
        """Push-staged work loop: execute queued tasks, report statuses
        via UpdateTaskStatus immediately (the reference's status-reporter
        task batches the same way, executor_server.rs:876-1017)."""
        self.start()
        while not self._stop.is_set():
            with self._queue_cond:
                while not self._queue and not self._stop.is_set():
                    self._queue_cond.wait(self.poll_interval)
                task = self._queue.popleft() if self._queue else None
            if task is None:
                # idle tick: retry any statuses whose delivery failed, so a
                # transient scheduler hiccup doesn't leave the task "running"
                # (and its slot reserved) forever — pull mode redelivers every
                # poll; push must too (ADVICE r4)
                self._flush_statuses()
                continue
            if task.job_id in self._cancelled:
                continue
            status = self._run_task(task)
            self._statuses.append(status)
            self._flush_statuses()
        # drain leftover statuses through the graceful-stop path
        log.info("executor %s stopped (push)", self.meta.executor_id)


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scheduler", required=True, help="scheduler RPC URL")
    ap.add_argument("--executor-id", default=None)
    ap.add_argument("--slots", type=int, default=1)
    ap.add_argument("--devices", type=int, default=0,
                    help="CPU-platform virtual device count (tests); 0 = "
                         "use the platform's real devices")
    ap.add_argument("--poll-ms", type=int, default=100)
    ap.add_argument("--heartbeat-s", type=float, default=10.0)
    ap.add_argument("--policy", choices=("pull", "push"), default="pull",
                    help="pull: PollWork loop; push: serve the "
                         "ExecutorGrpc-analog endpoint and run tasks the "
                         "scheduler POSTs (TaskSchedulingPolicy parity)")
    ap.add_argument("--listen-host", default="127.0.0.1")
    ap.add_argument("--listen-port", type=int, default=0)
    ap.add_argument("--advertise-host", default=None,
                    help="hostname the scheduler dials for push launches "
                         "when it differs from --listen-host (containers)")
    ap.add_argument("--work-dir", default=None,
                    help="executor-LOCAL shuffle spill dir: stage outputs "
                         "spill here and peers fetch them over the data "
                         "endpoint instead of a shared object store "
                         "(executor_process.rs --work-dir parity)")
    args = ap.parse_args(argv)

    if args.devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") +
            f" --xla_force_host_platform_device_count={args.devices}")
    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(message)s")
    executor_id = args.executor_id or f"executor-{os.uname().nodename}-{os.getpid()}"
    ex = ExecutorProcess(args.scheduler, executor_id,
                         task_slots=args.slots,
                         poll_interval=args.poll_ms / 1000.0,
                         heartbeat_interval=args.heartbeat_s,
                         work_dir=args.work_dir)

    def _term(signum, frame):
        log.info("SIGTERM: graceful stop")
        ex.stop(graceful=True)

    signal.signal(signal.SIGTERM, _term)
    try:
        if args.policy == "push":
            ex.listen(args.listen_host, args.listen_port,
                      advertise_host=args.advertise_host)
            ex.run_push()
        else:
            # pull workers still serve shuffle data to peers (every
            # reference executor runs its Flight service regardless of
            # scheduling policy); data_only keeps them out of push launch
            ex.listen(args.listen_host, args.listen_port,
                      advertise_host=args.advertise_host, data_only=True)
            ex.run_forever()
    except KeyboardInterrupt:
        ex.stop(graceful=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
