"""KeyValueStore layer (storage/mod.rs:53 parity): keyspaces, txns, mv,
locks, watches; memory and sqlite backends; KeyValueJobStore adapter with
scheduler-restart recovery."""

import threading

import pytest

from ballista_tpu.scheduler.kv import (Keyspace, KeyValueJobStore,
                                       MemoryKeyValueStore,
                                       SqliteKeyValueStore, WatchEvent)


@pytest.fixture(params=["memory", "sqlite"])
def store(request, tmp_path):
    if request.param == "memory":
        return MemoryKeyValueStore()
    return SqliteKeyValueStore(str(tmp_path / "kv.db"))


class TestKeyValueStore:
    def test_put_get_delete(self, store):
        assert store.get(Keyspace.EXECUTORS, "e1") is None
        store.put(Keyspace.EXECUTORS, "e1", '{"slots":4}')
        assert store.get(Keyspace.EXECUTORS, "e1") == '{"slots":4}'
        # keyspaces are disjoint
        assert store.get(Keyspace.SESSIONS, "e1") is None
        store.delete(Keyspace.EXECUTORS, "e1")
        assert store.get(Keyspace.EXECUTORS, "e1") is None

    def test_scan_prefix_ordering(self, store):
        for k in ("job3", "job1", "job2", "task1"):
            store.put(Keyspace.JOB_STATUS, k, k.upper())
        assert store.scan(Keyspace.JOB_STATUS, "job") == [
            ("job1", "JOB1"), ("job2", "JOB2"), ("job3", "JOB3")]
        assert len(store.scan(Keyspace.JOB_STATUS)) == 4

    def test_txn_atomic(self, store):
        store.put(Keyspace.SLOTS, "a", "1")
        store.apply_txn([
            ("put", Keyspace.SLOTS, "b", "2"),
            ("delete", Keyspace.SLOTS, "a", None),
        ])
        assert store.get(Keyspace.SLOTS, "a") is None
        assert store.get(Keyspace.SLOTS, "b") == "2"

    def test_mv(self, store):
        store.put(Keyspace.JOB_STATUS, "j1", "running")
        store.mv(Keyspace.JOB_STATUS, Keyspace.SESSIONS, "j1")
        assert store.get(Keyspace.JOB_STATUS, "j1") is None
        assert store.get(Keyspace.SESSIONS, "j1") == "running"
        store.mv(Keyspace.JOB_STATUS, Keyspace.SESSIONS, "missing")  # no-op

    def test_watch_prefix_and_cancel(self, store):
        w = store.watch(Keyspace.HEARTBEATS, "e")
        store.put(Keyspace.HEARTBEATS, "e1", "t1")
        store.put(Keyspace.HEARTBEATS, "x9", "t2")     # prefix mismatch
        store.put(Keyspace.EXECUTORS, "e1", "meta")    # keyspace mismatch
        store.delete(Keyspace.HEARTBEATS, "e1")
        evs = w.drain()
        assert [(e.kind, e.key) for e in evs] == [
            (WatchEvent.PUT, "e1"), (WatchEvent.DELETE, "e1")]
        w.cancel()
        store.put(Keyspace.HEARTBEATS, "e2", "t3")
        assert w.drain() == []

    def test_lock_mutual_exclusion(self, store):
        order = []

        def worker(tag):
            with store.lock(Keyspace.SLOTS, "global"):
                order.append(f"{tag}-in")
                order.append(f"{tag}-out")

        ts = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
        with store.lock(Keyspace.SLOTS, "global"):
            for t in ts:
                t.start()
            assert order == []  # all blocked while we hold it
        for t in ts:
            t.join()
        # each worker's in/out is adjacent: no interleaving
        for i in range(0, len(order), 2):
            assert order[i].split("-")[0] == order[i + 1].split("-")[0]

    def test_sqlite_durability(self, tmp_path):
        path = str(tmp_path / "durable.db")
        s1 = SqliteKeyValueStore(path)
        s1.put(Keyspace.EXECUTION_GRAPH, "j1", '{"g":1}')
        s1.close()
        s2 = SqliteKeyValueStore(path)
        assert s2.get(Keyspace.EXECUTION_GRAPH, "j1") == '{"g":1}'
        s2.close()


class TestKeyValueJobStore:
    def _graph(self, job_id="jkv1"):
        from ballista_tpu.scheduler.execution_graph import ExecutionGraph
        return ExecutionGraph(job_id, [(0, 2, []), (1, 1, [0])])

    def test_round_trip_and_status(self, store):
        js = KeyValueJobStore(store)
        g = self._graph()
        js.save_job(g, plan_json='{"plan":"p"}')
        doc = js.get_job("jkv1")
        assert doc["plan"] == '{"plan":"p"}'
        assert doc["graph"]["job_id"] == "jkv1"
        assert js.get_job_status("jkv1")["state"] == g.state.value
        assert js.list_jobs() == ["jkv1"]
        # plan survives a re-save without plan_json
        js.save_job(g)
        assert js.get_job("jkv1")["plan"] == '{"plan":"p"}'
        js.remove_job("jkv1")
        assert js.get_job("jkv1") is None
        assert js.get_job_status("jkv1") is None

    def test_job_state_events(self, store):
        js = KeyValueJobStore(store)
        w = js.job_state_events()
        g = self._graph("jev1")
        js.save_job(g)
        evs = w.drain()
        assert len(evs) == 1 and evs[0].key == "jev1"

    def test_scheduler_recovery_via_kv(self, store):
        """SchedulerServer.recover_jobs works over the KV store — the
        takeover the reference stubs (kv.rs:697)."""
        from ballista_tpu.scheduler.server import (ExecutorMetadata,
                                                   SchedulerServer)
        from ballista_tpu.scheduler.execution_graph import JobState
        from tests.test_scheduler import VirtualLauncher

        js = KeyValueJobStore(store)
        # a scheduler dies mid-job (blackhole launcher: nothing completes)
        class Blackhole(VirtualLauncher):
            def launch(self, tasks, report):
                pass

        s1 = SchedulerServer(Blackhole(), job_store=js)
        s1.register_executor(ExecutorMetadata("e1", task_slots=4))
        from tests.test_scheduler import diamond_graph
        s1.submit_job(diamond_graph("jrec1"))
        s1.run_until_idle()

        # a fresh scheduler takes over from the same store
        s2 = SchedulerServer(VirtualLauncher(), job_store=js)
        s2.register_executor(ExecutorMetadata("e2", task_slots=8))
        recovered = s2.recover_jobs()
        assert recovered == ["jrec1"]
        s2.run_until_idle()
        assert s2.task_manager.jobs["jrec1"].state is JobState.SUCCESSFUL
