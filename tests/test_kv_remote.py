"""Shared network KV backend (storage/etcd.rs:37 parity): two client
processes'-worth of RemoteKeyValueStore against one KvService — cross-client
visibility, transactional watch events, lease locks with TTL takeover, and
scheduler-restart job recovery through the shared store."""

import threading
import time

import pytest

from ballista_tpu.scheduler.kv import (Keyspace, KeyValueJobStore,
                                       MemoryKeyValueStore)
from ballista_tpu.scheduler.kv_remote import RemoteKeyValueStore, serve_kv


@pytest.fixture()
def kv_url():
    service, httpd = serve_kv()
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def test_cross_client_put_get_scan_txn(kv_url):
    a = RemoteKeyValueStore(kv_url)
    b = RemoteKeyValueStore(kv_url)
    a.put(Keyspace.EXECUTORS, "e1", '{"slots":4}')
    assert b.get(Keyspace.EXECUTORS, "e1") == '{"slots":4}'
    b.apply_txn([("put", Keyspace.SLOTS, "s1", "1"),
                 ("put", Keyspace.SLOTS, "s2", "2"),
                 ("delete", Keyspace.EXECUTORS, "e1", None)])
    assert a.get(Keyspace.EXECUTORS, "e1") is None
    assert a.scan(Keyspace.SLOTS) == [("s1", "1"), ("s2", "2")]
    # keyspaces stay disjoint
    assert a.get(Keyspace.SESSIONS, "s1") is None


def test_watch_sees_other_clients_events(kv_url):
    a = RemoteKeyValueStore(kv_url)
    b = RemoteKeyValueStore(kv_url)
    w = a.watch(Keyspace.HEARTBEATS, "e")
    b.put(Keyspace.HEARTBEATS, "e1", "t1")
    b.put(Keyspace.HEARTBEATS, "x9", "t2")   # prefix mismatch: filtered
    b.delete(Keyspace.HEARTBEATS, "e1")
    evs = w.drain()
    assert [(e.kind, e.key) for e in evs] == [("put", "e1"),
                                              ("delete", "e1")]
    # long-poll: a put from another thread wakes a blocked poll
    def later():
        time.sleep(0.2)
        b.put(Keyspace.HEARTBEATS, "e2", "t3")
    threading.Thread(target=later, daemon=True).start()
    ev = w.poll(timeout=5.0)
    assert ev is not None and ev.key == "e2"


def test_lease_lock_mutual_exclusion_and_ttl_takeover(kv_url):
    a = RemoteKeyValueStore(kv_url, lock_ttl_s=0.5)
    b = RemoteKeyValueStore(kv_url, lock_ttl_s=0.5)
    order = []
    with a.lock(Keyspace.SLOTS, "global"):
        order.append("a")
        with pytest.raises(TimeoutError):
            with b.lock(Keyspace.SLOTS, "global", acquire_timeout_s=0.2):
                order.append("b-too-early")
    with b.lock(Keyspace.SLOTS, "global", acquire_timeout_s=2.0):
        order.append("b")
    assert order == ["a", "b"]
    # TTL takeover: a "crashed" holder (never unlocks) expires
    out = a._call("lock", ks="slots", key="wedged", ttl_s=0.3)
    assert out["acquired"]
    with b.lock(Keyspace.SLOTS, "wedged", acquire_timeout_s=2.0):
        order.append("stolen")
    assert order[-1] == "stolen"


def test_job_recovery_through_shared_store(kv_url):
    """Scheduler-restart takeover via the SHARED store: scheduler 1 saves a
    running job; scheduler 2 (fresh client, same service) recovers it —
    the multi-scheduler HA story the etcd backend exists for (kv.rs:697)."""
    from ballista_tpu.scheduler.execution_graph import ExecutionGraph
    from ballista_tpu.scheduler.job_store import recover_graphs

    s1 = KeyValueJobStore(RemoteKeyValueStore(kv_url))
    g = ExecutionGraph("jobr", [(0, 4, []), (1, 4, [0])])
    s1.save_job(g)
    s2 = KeyValueJobStore(RemoteKeyValueStore(kv_url))
    recovered = recover_graphs(s2)
    assert [r.job_id for r in recovered] == ["jobr"]
    r = recovered[0]
    assert set(r.stages) == {0, 1}
    assert r.stages[1].inputs == (0,)


def test_embedded_store_can_back_the_service(tmp_path):
    """The service hosts any embedded backend; sqlite gives durability."""
    from ballista_tpu.scheduler.kv import SqliteKeyValueStore
    service, httpd = serve_kv(SqliteKeyValueStore(str(tmp_path / "kv.db")))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        c = RemoteKeyValueStore(url)
        c.put(Keyspace.JOB_STATUS, "j1", "running")
        assert c.get(Keyspace.JOB_STATUS, "j1") == "running"
        # durable: visible through a fresh embedded handle on the same file
        assert SqliteKeyValueStore(str(tmp_path / "kv.db")).get(
            Keyspace.JOB_STATUS, "j1") == "running"
    finally:
        httpd.shutdown()


def test_lease_keepalive_holds_lock_beyond_ttl(kv_url):
    """A holder inside the with-block longer than lock_ttl_s keeps
    exclusion: the keep-alive thread renews the lease (etcd
    LeaseKeepAlive; ADVICE r3 — the lease used to silently expire)."""
    a = RemoteKeyValueStore(kv_url, lock_ttl_s=0.3)
    b = RemoteKeyValueStore(kv_url, lock_ttl_s=0.3)
    with a.lock(Keyspace.SLOTS, "long"):
        time.sleep(1.0)  # > 3x the TTL
        with pytest.raises(TimeoutError):
            with b.lock(Keyspace.SLOTS, "long", acquire_timeout_s=0.2):
                pass
    # released cleanly afterwards
    with b.lock(Keyspace.SLOTS, "long", acquire_timeout_s=2.0):
        pass


def test_lock_lost_raises():
    """If the lease is taken over anyway (server-side expiry while the
    keep-alive could not renew), exiting the critical section raises
    LockLostError instead of silently ignoring the stale unlock."""
    from ballista_tpu.scheduler.kv_remote import LockLostError, serve_kv

    service, httpd = serve_kv()
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    a = RemoteKeyValueStore(url, lock_ttl_s=30.0)
    b = RemoteKeyValueStore(url, lock_ttl_s=30.0)
    with pytest.raises(LockLostError):
        with a.lock(Keyspace.SLOTS, "steal"):
            # force-expire the real lease server-side (what a network
            # partition longer than the TTL produces), then a peer grabs it
            with service.cond:
                lease, _expiry = service.locks[("slots", "steal")]
                service.locks[("slots", "steal")] = (lease, 0.0)
            out = b._call("lock", ks="slots", key="steal", ttl_s=30.0)
            assert out["acquired"]  # peer now holds it
    httpd.shutdown()


def test_watch_compaction_resyncs(kv_url):
    """A watcher whose since_rev predates the retained log window gets a
    consistent resync (synthetic PUTs of the current state), never a
    silent gap (etcd ErrCompacted parity; ADVICE r3)."""
    from ballista_tpu.scheduler.kv_remote import serve_kv as _serve
    from ballista_tpu.scheduler.kv_remote import KvService
    service, httpd = _serve()
    service.max_log = 5
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    a = RemoteKeyValueStore(url)
    w = a.watch(Keyspace.SLOTS, "k")
    for i in range(20):
        a.put(Keyspace.SLOTS, f"k{i:02d}", str(i))
    a.delete(Keyspace.SLOTS, "k00")
    evs = w.drain()
    # resync delivers the CURRENT state (19 live keys), not a truncated
    # event suffix with missing puts
    keys = sorted(e.key for e in evs)
    assert keys == [f"k{i:02d}" for i in range(1, 20)]
    assert all(e.kind == "put" for e in evs)
    # subsequent events flow incrementally again
    a.put(Keyspace.SLOTS, "k99", "x")
    ev = w.poll(timeout=5.0)
    assert ev is not None and ev.key == "k99"
    httpd.shutdown()


def test_watch_compaction_synthesizes_deletes(kv_url):
    """A key the watcher observed alive that is deleted inside a compacted
    gap must surface as a synthetic DELETE on resync — a PUT-only resync
    would mirror the stale key forever (ADVICE r4)."""
    from ballista_tpu.scheduler.kv_remote import serve_kv as _serve
    service, httpd = _serve()
    service.max_log = 5
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    a = RemoteKeyValueStore(url)
    w = a.watch(Keyspace.SLOTS, "k")
    a.put(Keyspace.SLOTS, "kdead", "1")
    assert [e.key for e in w.drain()] == ["kdead"]  # observed alive
    # now delete it and push the log past the retention window
    a.delete(Keyspace.SLOTS, "kdead")
    for i in range(10):
        a.put(Keyspace.SLOTS, f"k{i:02d}", str(i))
    evs = w.drain()
    dels = [(e.kind, e.key) for e in evs if e.kind == "delete"]
    assert dels == [("delete", "kdead")]
    puts = sorted(e.key for e in evs if e.kind == "put")
    assert puts == [f"k{i:02d}" for i in range(10)]
    httpd.shutdown()


def test_unlock_transport_failure_is_not_lock_lost(kv_url):
    """A transient network failure on the FINAL unlock must not raise
    LockLostError when the lease was healthy throughout — the lease just
    expires on its own (ADVICE r4)."""
    a = RemoteKeyValueStore(kv_url, lock_ttl_s=0.5)
    orig_call = a._call

    def flaky_call(verb, **req):
        if verb == "unlock":
            raise OSError("connection reset")
        return orig_call(verb, **req)

    a._call = flaky_call
    with a.lock(Keyspace.SLOTS, "flaky"):   # must NOT raise on exit
        pass
    # lease self-expires; a peer can acquire after the TTL
    b = RemoteKeyValueStore(kv_url, lock_ttl_s=0.5)
    with b.lock(Keyspace.SLOTS, "flaky", acquire_timeout_s=2.0):
        pass
