"""Cassandra storage tests over an in-process fake cluster/session.

The fake interprets exactly the CQL shapes CassandraStorage emits
(create keyspace/table, insert, select distinct/by-key, count, delete),
so the untestable-without-a-cluster backend gets real path coverage.
"""

import sys
import types
from collections import namedtuple

import pytest

Row = namedtuple("Row", ["key", "value", "ts"])
CountRow = namedtuple("CountRow", ["c"])
KeyRow = namedtuple("KeyRow", ["key"])


class _Result(list):
    def one(self):
        return self[0] if self else None


class FakeSession:
    def __init__(self):
        self.tables = {}

    def set_keyspace(self, ks):
        self.keyspace = ks

    def execute(self, query, params=()):
        q = " ".join(query.split())
        if q.startswith("CREATE KEYSPACE"):
            return _Result()
        if q.startswith("CREATE TABLE"):
            name = q.split()[5]
            self.tables.setdefault(name, [])
            return _Result()
        if q.startswith("INSERT INTO"):
            name = q.split()[2]
            key, value, ts = params
            rows = self.tables[name]
            # (key, value) primary key => upsert
            rows[:] = [r for r in rows if not (r.key == key and r.value == value)]
            rows.append(Row(key, value, ts))
            return _Result()
        if q.startswith("SELECT DISTINCT key FROM"):
            name = q.split()[4]
            seen, out = set(), []
            for r in self.tables[name]:
                if r.key not in seen:
                    seen.add(r.key)
                    out.append(KeyRow(r.key))
            return _Result(out)
        if q.startswith("SELECT COUNT(*)"):
            parts = q.split()
            name = parts[parts.index("FROM") + 1]
            (key,) = params
            return _Result(
                [CountRow(sum(1 for r in self.tables[name] if r.key == key))]
            )
        if q.startswith("SELECT key FROM"):
            name = q.split()[3]
            (key,) = params
            return _Result(
                [KeyRow(r.key) for r in self.tables[name] if r.key == key][:1]
            )
        if q.startswith("SELECT value, ts FROM") or q.startswith("SELECT value FROM"):
            name = q.split()[q.split().index("FROM") + 1]
            (key,) = params
            return _Result([r for r in self.tables[name] if r.key == key])
        if q.startswith("DELETE FROM"):
            name = q.split()[2]
            rows = self.tables[name]
            if "AND value" in q:
                key, value = params
                rows[:] = [r for r in rows
                           if not (r.key == key and r.value == value)]
            else:
                (key,) = params
                rows[:] = [r for r in rows if r.key != key]
            return _Result()
        raise AssertionError("unhandled CQL: %s" % q)


class FakeCluster:
    _session = FakeSession()

    def __init__(self, contact_points=None, port=9042):
        pass

    def connect(self):
        return self._session


@pytest.fixture()
def fake_cassandra(monkeypatch):
    FakeCluster._session = FakeSession()
    cass = types.ModuleType("cassandra")
    cluster_mod = types.ModuleType("cassandra.cluster")
    cluster_mod.Cluster = FakeCluster
    cass.cluster = cluster_mod
    monkeypatch.setitem(sys.modules, "cassandra", cass)
    monkeypatch.setitem(sys.modules, "cassandra.cluster", cluster_mod)
    # reset the shared-session cache
    from datasketch_tpu.storage import CassandraSharedSession

    monkeypatch.setattr(CassandraSharedSession, "_session", None)
    monkeypatch.setattr(CassandraSharedSession, "_session_config", None)


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
    lsh.remove("m1")
    assert "m1" not in lsh
