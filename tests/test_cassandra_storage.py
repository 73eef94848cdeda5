"""Cassandra storage tests over an in-process fake cluster/session.

The fake interprets exactly the CQL shapes CassandraStorage emits —
prepared statements (insert/upsert/select/count/token-paged key scan/
deletes), ``execute_concurrent`` batches, keyspace/table DDL — so the
untestable-without-a-cluster backend gets real path coverage, including
assertions that writes actually flow through the concurrent executor in
bounded batches.
"""

import hashlib
import sys
import types
from collections import namedtuple

import pytest

Row = namedtuple("Row", ["key", "value", "ts"])
CountRow = namedtuple("CountRow", ["key", "count"])
KeyRow = namedtuple("KeyRow", ["key"])
TokenKeyRow = namedtuple("TokenKeyRow", ["key", "f_token"])


def _token(key) -> int:
    """Deterministic fake Murmur3 partitioner token (signed 64-bit)."""
    digest = hashlib.md5(key if isinstance(key, bytes) else str(key).encode())
    return int.from_bytes(digest.digest()[:8], "big", signed=True)


class FakePrepared:
    def __init__(self, text):
        self.text = text


class FakeSession:
    def __init__(self):
        self.tables = {}
        self.prepared_texts = []
        self.execute_calls = 0  # direct session.execute round trips

    def set_keyspace(self, ks):
        self.keyspace = ks

    def prepare(self, query):
        text = " ".join(query.split())
        self.prepared_texts.append(text)
        return FakePrepared(text)

    def execute(self, query, params=()):
        self.execute_calls += 1
        return self._run(query, params)

    def _run(self, query, params=()):
        q = query.text if isinstance(query, FakePrepared) else " ".join(
            query.split()
        )
        words = q.split()
        if q.startswith("CREATE KEYSPACE") or q.startswith("DROP KEYSPACE"):
            return []
        if q.startswith("CREATE TABLE"):
            self.tables.setdefault(words[5], [])
            return []
        if q.startswith("DROP TABLE"):
            self.tables.pop(words[4], None)
            return []
        if q.startswith("INSERT INTO"):
            name = words[2]
            key, value, ts = params
            rows = self.tables[name]
            # (key, value) primary key => upsert
            rows[:] = [r for r in rows if not (r.key == key and r.value == value)]
            rows.append(Row(key, value, ts))
            return []
        if q.startswith("UPDATE"):
            name = words[1]
            ts, key, value = params
            rows = self.tables[name]
            rows[:] = [r for r in rows if not (r.key == key and r.value == value)]
            rows.append(Row(key, value, ts))
            return []
        if q.startswith("SELECT DISTINCT key, TOKEN(key)"):
            name = words[words.index("FROM") + 1]
            min_token, limit = params
            pairs = sorted(
                {(r.key, _token(r.key)) for r in self.tables[name]},
                key=lambda p: p[1],
            )
            page = [TokenKeyRow(k, t) for k, t in pairs if t >= min_token]
            return page[:limit]
        if q.startswith("SELECT key, COUNT(value)"):
            name = words[words.index("FROM") + 1]
            (key,) = params
            n = sum(1 for r in self.tables[name] if r.key == key)
            return [CountRow(key, n)] if n else []
        if q.startswith("SELECT key, value, ts FROM"):
            name = words[5]
            (key,) = params
            return [r for r in self.tables[name] if r.key == key]
        if q.startswith("SELECT key FROM"):
            name = words[3]
            (key,) = params
            return [KeyRow(r.key) for r in self.tables[name] if r.key == key][:1]
        if q.startswith("DELETE FROM"):
            name = words[2]
            rows = self.tables[name]
            if "AND value" in q:
                key, value = params
                rows[:] = [
                    r for r in rows if not (r.key == key and r.value == value)
                ]
            else:
                (key,) = params
                rows[:] = [r for r in rows if r.key != key]
            return []
        raise AssertionError("unhandled CQL: %s" % q)


class FakeCluster:
    _session = FakeSession()

    def __init__(self, contact_points=None, port=9042):
        pass

    def connect(self):
        return self._session


class FakeMonotonicTs:
    """Strictly increasing wall-clock-ish timestamps."""

    _last = [1_000_000]

    def __call__(self):
        self._last[0] += 1
        return self._last[0]


_CONCURRENT_BATCHES = []  # (n_statements, concurrency) per call


def fake_execute_concurrent(session, statements_and_params, concurrency=100):
    _CONCURRENT_BATCHES.append((len(statements_and_params), concurrency))
    return [(True, session._run(stmt, params))
            for stmt, params in statements_and_params]


@pytest.fixture()
def fake_cassandra(monkeypatch):
    FakeCluster._session = FakeSession()
    del _CONCURRENT_BATCHES[:]
    cass = types.ModuleType("cassandra")
    cluster_mod = types.ModuleType("cassandra.cluster")
    cluster_mod.Cluster = FakeCluster
    cluster_mod.MonotonicTimestampGenerator = FakeMonotonicTs
    concurrent_mod = types.ModuleType("cassandra.concurrent")
    concurrent_mod.execute_concurrent = fake_execute_concurrent
    cass.cluster = cluster_mod
    cass.concurrent = concurrent_mod
    monkeypatch.setitem(sys.modules, "cassandra", cass)
    monkeypatch.setitem(sys.modules, "cassandra.cluster", cluster_mod)
    monkeypatch.setitem(sys.modules, "cassandra.concurrent", concurrent_mod)
    # reset the shared-session cache and shared buffers
    from datasketch_tpu.storage import CassandraSharedSession

    monkeypatch.setattr(CassandraSharedSession, "_session", None)
    monkeypatch.setattr(CassandraSharedSession, "_session_config", None)
    monkeypatch.setattr(CassandraSharedSession, "_shared_write_buffer", [])
    monkeypatch.setattr(CassandraSharedSession, "_shared_select_buffer", [])
    return FakeCluster


def test_cassandra_list_and_set_storage(fake_cassandra):
    from datasketch_tpu.storage import ordered_storage, unordered_storage

    cfg = {"type": "cassandra", "cassandra": {"keyspace": "t"}}
    ls = ordered_storage(cfg, name=b"orders")
    ls.insert(b"k", b"a", b"b")
    assert ls.get(b"k") == [b"a", b"b"]  # ts-ordered
    assert ls.has_key(b"k") and ls.size() == 1
    assert ls.itemcounts() == {b"k": 2}
    ls.remove_val(b"k", b"a")
    assert ls.get(b"k") == [b"b"]
    ls.remove(b"k")
    assert not ls.has_key(b"k")

    us = unordered_storage(cfg, name=b"sets")
    us.insert(b"k", b"v", b"v")  # primary-key upsert => set semantics
    assert us.get(b"k") == {b"v"}


def test_statements_are_prepared_and_batched(fake_cassandra):
    from datasketch_tpu.storage import ordered_storage

    cfg = {"type": "cassandra", "cassandra": {"keyspace": "b"}}
    ls = ordered_storage(cfg, name=b"batched")
    session = fake_cassandra._session
    assert any("INSERT INTO lsh_" in t for t in session.prepared_texts)
    assert any(t.startswith("UPDATE") for t in session.prepared_texts)

    direct_before = session.execute_calls
    del _CONCURRENT_BATCHES[:]
    vals = [b"v%d" % i for i in range(250)]
    ls.insert(b"k", *vals)
    # every write flowed through execute_concurrent in <=100-stmt chunks,
    # NOT through one session.execute per value
    assert session.execute_calls == direct_before
    assert [n for n, _ in _CONCURRENT_BATCHES] == [100, 100, 50]
    assert ls.get(b"k") == vals


def test_buffered_writes_honor_buffer_kwarg(fake_cassandra):
    from datasketch_tpu.storage import ordered_storage

    cfg = {"type": "cassandra", "cassandra": {"keyspace": "buf"}}
    ls = ordered_storage(cfg, name=b"bufs")
    ls.buffer_size = 10
    del _CONCURRENT_BATCHES[:]
    for i in range(9):
        ls.insert(b"k", b"v%d" % i, buffer=True)
    assert _CONCURRENT_BATCHES == []  # below threshold: nothing flushed
    assert ls.get(b"k") == []
    del _CONCURRENT_BATCHES[:]  # the get above is itself one select batch
    ls.insert(b"k", b"v9", buffer=True)  # 10th value triggers the flush
    assert _CONCURRENT_BATCHES == [(10, 100)]
    assert ls.get(b"k") == [b"v%d" % i for i in range(10)]
    # explicit drain
    ls.insert(b"k2", b"x", buffer=True)
    ls.empty_buffer()
    assert ls.get(b"k2") == [b"x"]


def test_itemcounts_single_concurrent_pass(fake_cassandra):
    from datasketch_tpu.storage import ordered_storage

    cfg = {"type": "cassandra", "cassandra": {"keyspace": "c"}}
    ls = ordered_storage(cfg, name=b"counts")
    for i in range(20):
        ls.insert(b"key%d" % i, *[b"v%d" % j for j in range(i + 1)])
    del _CONCURRENT_BATCHES[:]
    counts = ls.itemcounts()
    assert counts == {b"key%d" % i: i + 1 for i in range(20)}
    # all 20 COUNT statements in one execute_concurrent call
    assert [n for n, _ in _CONCURRENT_BATCHES] == [20]


def test_token_paged_key_scan(fake_cassandra):
    from datasketch_tpu import storage as storage_mod
    from datasketch_tpu.storage import ordered_storage

    cfg = {"type": "cassandra", "cassandra": {"keyspace": "p"}}
    ls = ordered_storage(cfg, name=b"paged")
    keys = [b"key-%03d" % i for i in range(25)]
    for k in keys:
        ls.insert(k, b"v")
    # force multiple pages
    old = storage_mod.CassandraStorage.PAGE_SIZE
    storage_mod.CassandraStorage.PAGE_SIZE = 7
    try:
        assert sorted(ls.keys()) == sorted(keys)
        assert ls.size() == 25
    finally:
        storage_mod.CassandraStorage.PAGE_SIZE = old


def test_select_buffer_and_getmany(fake_cassandra):
    from datasketch_tpu.storage import ordered_storage

    cfg = {"type": "cassandra", "cassandra": {"keyspace": "s"}}
    ls = ordered_storage(cfg, name=b"sel")
    ls.insert(b"a", b"1", b"2")
    ls.insert(b"b", b"3")
    assert ls.getmany(b"a", b"b", b"missing") == [[b"1", b"2"], [b"3"], []]
    ls.add_to_select_buffer([b"a"])
    ls.add_to_select_buffer([b"b"])
    assert ls.collect_select_buffer() == [[b"1", b"2"], [b"3"]]
    assert ls.collect_select_buffer() == []


def test_ts_monotonic_across_reconnect(fake_cassandra):
    """List ordering must survive a new storage attaching to the same
    table: timestamps are wall-clock monotonic, not a per-process counter
    restarting at 0 (round-1 advisory finding)."""
    import pickle

    from datasketch_tpu.storage import ordered_storage

    cfg = {"type": "cassandra", "cassandra": {"keyspace": "m"}}
    ls = ordered_storage(cfg, name=b"mono")
    ls.insert(b"k", b"first", b"second")
    # simulate a new session (e.g. another process) appending
    ls2 = pickle.loads(pickle.dumps(ls))
    ls2.insert(b"k", b"third")
    assert ls.get(b"k") == [b"first", b"second", b"third"]


def test_shared_buffer_pools_statements(fake_cassandra):
    from datasketch_tpu.storage import ordered_storage

    cfg = {
        "type": "cassandra",
        "cassandra": {"keyspace": "sh", "shared_buffer": True},
    }
    a = ordered_storage(cfg, name=b"shareda")
    b = ordered_storage(cfg, name=b"sharedb")
    a.buffer_size = 4
    b.buffer_size = 4
    del _CONCURRENT_BATCHES[:]
    a.insert(b"k", b"1", b"2", buffer=True)
    b.insert(b"k", b"3", buffer=True)
    assert _CONCURRENT_BATCHES == []
    b.insert(b"k", b"4", buffer=True)  # pooled buffer reaches 4 -> flush
    assert len(_CONCURRENT_BATCHES) == 1
    assert a.get(b"k") == [b"1", b"2"]
    assert b.get(b"k") == [b"3", b"4"]


def test_drop_tables_config(fake_cassandra):
    from datasketch_tpu.storage import ordered_storage

    cfg = {"type": "cassandra", "cassandra": {"keyspace": "d"}}
    ls = ordered_storage(cfg, name=b"drop")
    ls.insert(b"k", b"v")
    cfg_drop = {
        "type": "cassandra",
        "cassandra": {"keyspace": "d", "drop_tables": True},
    }
    ls2 = ordered_storage(cfg_drop, name=b"drop")
    assert ls2.get(b"k") == []


def test_cassandra_lsh_roundtrip(fake_cassandra):
    from datasketch_tpu import MinHash, MinHashLSH

    def mh(tokens):
        m = MinHash(num_perm=128)
        m.update_batch([t.encode() for t in tokens])
        return m

    lsh = MinHashLSH(
        threshold=0.5,
        num_perm=128,
        storage_config={"type": "cassandra", "cassandra": {"keyspace": "l"},
                        "basename": b"tst"},
        prepickle=True,
    )
    m1, m2 = mh(["a", "b", "c", "d"]), mh(["a", "b", "c", "e"])
    lsh.insert("m1", m1)
    lsh.insert("m2", m2)
    assert set(lsh.query(m1)) >= {"m1", "m2"}
    assert sorted(map(sorted, lsh.query_batch([m1, m2]))) is not None
    lsh.remove("m1")
    assert "m1" not in lsh
    # buffered insertion session drains through the write buffer
    with lsh.insertion_session(buffer_size=100) as session:
        session.insert("m3", mh(["a", "b", "c", "f"]))
    assert "m3" in lsh
