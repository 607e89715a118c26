"""REST introspection API.

Reference parity: the scheduler's warp routes (`api/mod.rs:85-137`,
handlers `api/handlers.rs`): /api/state, /api/jobs, /api/job/{id},
/api/job/{id}/dot, /api/metrics — served here by a stdlib ThreadingHTTPServer
over a StandaloneCluster. (The React UI consuming these is a round-2 item;
the dot output renders with any graphviz viewer.)
"""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional


class ApiServer:
    def __init__(self, cluster, host: str = "127.0.0.1", port: int = 0):
        self.cluster = cluster
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code: int, body, ctype="application/json"):
                data = (json.dumps(body).encode()
                        if ctype == "application/json" else body.encode())
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                try:
                    outer._route(self)
                except Exception as e:  # noqa: BLE001
                    self._send(500, {"error": f"{type(e).__name__}: {e}"})

            def do_PATCH(self):
                m = re.fullmatch(r"/api/job/([a-z0-9]+)", self.path)
                if m:
                    ok = outer.cancel_job(m.group(1))
                    self._send(200 if ok else 404,
                               {"cancelled": bool(ok), "job_id": m.group(1)})
                else:
                    self._send(404, {"error": "not found"})

        self.server = ThreadingHTTPServer((host, port), Handler)
        self.port = self.server.server_address[1]
        self._thread: Optional[threading.Thread] = None

    # -- routing --
    def _route(self, h):
        path = h.path
        sched = self.cluster.scheduler
        if path in ("/", "/index.html"):
            h._send(200, DASHBOARD_HTML, ctype="text/html")
            return
        if path == "/api/state":
            h._send(200, {
                "executors": [
                    {"id": e.meta.executor_id, "task_slots": e.meta.task_slots,
                     "free_slots": e.free_slots, "status": e.status.value}
                    for e in sched.executor_manager.executors.values()],
                "active_jobs": sum(
                    1 for g in sched.task_manager.jobs.values()
                    if g.state.value in ("running", "queued")),
                "started": True,
            })
            return
        if path == "/api/jobs":
            h._send(200, [g.status()
                          for g in sched.task_manager.jobs.values()])
            return
        m = re.fullmatch(r"/api/job/([a-z0-9]+)", path)
        if m:
            h._send(200, sched.job_status(m.group(1)))
            return
        if path == "/api/executors":
            # api/handlers.rs get_executors: metadata + heartbeat age +
            # 1/5/15-min load averages (metrics/load.rs)
            import time as _t
            now = _t.time()
            for e in sched.executor_manager.executors.values():
                e.sample_load()
            h._send(200, [
                {"id": e.meta.executor_id, "host": e.meta.host,
                 "port": e.meta.port, "task_slots": e.meta.task_slots,
                 "free_slots": e.free_slots, "status": e.status.value,
                 "last_seen_s": round(now - e.last_heartbeat, 1),
                 "load_avg": [round(x, 3) for x in e.load_avg]}
                for e in sched.executor_manager.executors.values()])
            return
        m = re.fullmatch(r"/api/job/([a-z0-9]+)/dot(_svg)?", path)
        if m:
            jc = self.cluster.launcher.jobs.get(m.group(1))
            if jc is None:
                h._send(404, {"error": "not found"})
                return
            from .utils.dot import distributed_plan_dot
            dot = distributed_plan_dot(jc.dplan)
            if m.group(2):  # /dot_svg (api/handlers.rs get_query_dot_svg)
                svg = _render_svg(dot)
                if svg is None:
                    h._send(501, {"error": "graphviz 'dot' not installed"})
                else:
                    h._send(200, svg, ctype="image/svg+xml")
                return
            h._send(200, dot, ctype="text/vnd.graphviz")
            return
        m = re.fullmatch(r"/api/job/([a-z0-9]+)/stages", path)
        if m:
            # api/handlers.rs get_query_stages: per-stage state + metrics
            status = sched.job_status(m.group(1))
            if status.get("state") == "not_found":
                h._send(404, {"error": "not found"})
                return
            jc = self.cluster.launcher.jobs.get(m.group(1))
            op_metrics = jc.op_metrics if jc is not None else {}
            stages = [dict(stage_id=sid, **st,
                           metrics={"operator_rows": op_metrics.get(sid)})
                      for sid, st in status.get("stages", {}).items()]
            h._send(200, {"job_id": m.group(1), "stages": stages})
            return
        m = re.fullmatch(r"/api/job/([a-z0-9]+)/stage/(\d+)/dot", path)
        if m:
            jc = self.cluster.launcher.jobs.get(m.group(1))
            if jc is None:
                h._send(404, {"error": "not found"})
                return
            from .utils.dot import stage_dot
            try:
                h._send(200, stage_dot(jc.dplan, int(m.group(2))),
                        ctype="text/vnd.graphviz")
            except KeyError:
                h._send(404, {"error": "no such stage"})
            return
        # KEDA external-scaler surface (proto/keda.proto:25 — IsActive /
        # GetMetrics; served as HTTP JSON for KEDA's metrics-api scaler).
        if path == "/api/scaler/is_active":
            h._send(200, {"result": sched.is_active()})
            return
        if path == "/api/scaler/metrics":
            h._send(200, {"metricName": "pending_tasks",
                          "metricValue": sched.pending_task_count()})
            return
        if path == "/api/metrics":
            h._send(200, {
                "pending_tasks": sched.pending_task_count(),
                "active": sched.is_active(),
                "jobs_total": len(sched.task_manager.jobs),
                "jobs_successful": sum(
                    1 for g in sched.task_manager.jobs.values()
                    if g.state.value == "successful"),
                "jobs_failed": sum(
                    1 for g in sched.task_manager.jobs.values()
                    if g.state.value == "failed"),
                "stage_metrics": {
                    sid: m.as_dict()
                    for sid, m in self.cluster.runtime.metrics.items()},
                "scheduler": sched.metrics.as_dict(),
            })
            return
        if path == "/metrics":
            # Prometheus exposition format (metrics/prometheus.rs endpoint)
            h._send(200, sched.metrics.prometheus_text(
                pending_tasks=sched.pending_task_count()),
                ctype="text/plain; version=0.0.4")
            return
        if path.startswith("/api/file_metadata"):
            # GetFileMetadata RPC analog (grpc.rs:293): parquet/csv schema
            # inference for clients
            from urllib.parse import parse_qs, urlparse
            q = parse_qs(urlparse(path).query)
            fpath = (q.get("path") or [""])[0]
            try:
                from .client.context import file_metadata
                h._send(200, file_metadata(fpath))
            except Exception as e:  # noqa: BLE001
                h._send(400, {"error": f"{type(e).__name__}: {e}"})
            return
        h._send(404, {"error": "not found"})

    def cancel_job(self, job_id: str) -> bool:  # noqa: D401
        return _cancel_job(self.cluster, job_id)

    # -- lifecycle --
    def start(self):
        self._thread = threading.Thread(target=self.server.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self.server.shutdown()


def _render_svg(dot: str):
    import shutil
    import subprocess
    exe = shutil.which("dot")
    if exe is None:
        return None
    try:
        return subprocess.run([exe, "-Tsvg"], input=dot.encode(),
                              capture_output=True, timeout=10,
                              check=True).stdout.decode()
    except Exception:  # noqa: BLE001
        return None


def _cancel_job(cluster, job_id: str) -> bool:
    if cluster.scheduler.task_manager.jobs.get(job_id) is None:
        return False
    cluster.scheduler.cancel_job(job_id)
    return True


# Minimal dashboard (the reference ships a React UI consuming the same
# routes, `ui/src`; this is the zero-build equivalent).
DASHBOARD_HTML = """<!doctype html>
<html><head><title>ballista_tpu</title><style>
body{font-family:monospace;margin:2em;background:#111;color:#ddd}
table{border-collapse:collapse;margin:1em 0}
td,th{border:1px solid #444;padding:4px 10px;text-align:left}
h1{color:#7cf} .ok{color:#7f7} .bad{color:#f77} a{color:#7cf}
</style></head><body>
<h1>ballista_tpu scheduler</h1>
<div id="state"></div><h2>Jobs</h2><div id="jobs"></div>
<script>
async function refresh(){
  const s = await (await fetch('/api/state')).json();
  document.getElementById('state').innerHTML =
    '<table><tr><th>executor</th><th>slots</th><th>status</th></tr>' +
    s.executors.map(e=>`<tr><td>${e.id}</td><td>${e.free_slots}/${e.task_slots}</td><td>${e.status}</td></tr>`).join('') +
    `</table>active jobs: ${s.active_jobs}`;
  const jobs = await (await fetch('/api/jobs')).json();
  document.getElementById('jobs').innerHTML =
    '<table><tr><th>job</th><th>state</th><th>stages</th><th>dot</th></tr>' +
    jobs.map(j=>{
      const cls = j.state==='successful'?'ok':(j.state==='failed'?'bad':'');
      const stages = Object.entries(j.stages).map(([id,st])=>`${id}:${st.state[0]}(${st.successful}/${st.partitions})`).join(' ');
      return `<tr><td>${j.job_id}</td><td class="${cls}">${j.state}</td><td>${stages}</td><td><a href="/api/job/${j.job_id}/dot">dot</a></td></tr>`;
    }).join('') + '</table>';
}
refresh(); setInterval(refresh, 2000);
</script></body></html>"""
