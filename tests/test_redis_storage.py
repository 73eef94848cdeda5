"""Redis storage + LSH-over-redis tests against the in-process fake client.

Mirrors the reference's mocked-redis suite (test_lsh.py:159-230) without a
redis server or even the redis package: a fake module is injected into
sys.modules before the storages import it.
"""

import pickle
import sys
import types

import pytest

from tests.fake_redis import FakeRedis


@pytest.fixture()
def fake_redis_module(monkeypatch):
    mod = types.ModuleType("redis")
    mod.Redis = FakeRedis
    monkeypatch.setitem(sys.modules, "redis", mod)
    return mod


def test_redis_list_and_set_storage(fake_redis_module):
    from datasketch_tpu.storage import ordered_storage, unordered_storage

    cfg = {"type": "redis", "redis": {"host": "fake", "port": 0}}
    ls = ordered_storage(cfg, name=b"t")
    ls.insert(b"k", b"a", b"b")
    assert ls.get(b"k") == [b"a", b"b"]
    assert ls.itemcounts() == {b"k": 2}
    assert b"k" in ls and len(ls) == 1
    ls.remove_val(b"k", b"a")
    assert ls.get(b"k") == [b"b"]
    ls.remove(b"k")
    assert not ls.has_key(b"k")

    us = unordered_storage(cfg, name=b"u")
    us.insert(b"k", b"v", b"v")
    assert us.get(b"k") == {b"v"}


def test_redis_buffered_writes_flush(fake_redis_module):
    from datasketch_tpu.storage import unordered_storage

    cfg = {"type": "redis", "redis": {}}
    us = unordered_storage(cfg, name=b"buf")
    us.buffer_size = 3
    us.insert(b"k1", b"v", buffer=True)
    us.insert(b"k2", b"v", buffer=True)
    assert us.get(b"k1") == set()  # still buffered
    us.insert(b"k3", b"v", buffer=True)  # hits buffer_size -> auto flush
    assert us.get(b"k1") == {b"v"} and us.get(b"k3") == {b"v"}
    us.insert(b"k4", b"v", buffer=True)
    us.empty_buffer()
    assert us.get(b"k4") == {b"v"}


def test_redis_env_indirection(fake_redis_module, monkeypatch):
    from datasketch_tpu.storage import _parse_redis_config

    monkeypatch.setenv("DS_REDIS_HOST", "example")
    cfg = _parse_redis_config(
        {"host": {"env": "DS_REDIS_HOST", "default": "x"},
         "port": {"env": "MISSING_VAR", "default": 6379}}
    )
    assert cfg == {"host": "example", "port": 6379}


def test_lsh_over_fake_redis_with_sessions(fake_redis_module):
    from datasketch_tpu import MinHash, MinHashLSH

    def mh(tokens):
        m = MinHash(num_perm=128)
        m.update_batch([t.encode() for t in tokens])
        return m

    lsh = MinHashLSH(
        threshold=0.5,
        num_perm=128,
        storage_config={"type": "redis", "redis": {}, "basename": b"tst"},
    )
    assert lsh.prepickle  # default True for redis
    m1, m2 = mh(["a", "b", "c", "d"]), mh(["a", "b", "c", "e"])
    with lsh.insertion_session() as sess:
        sess.insert("m1", m1)
        sess.insert("m2", m2)
    assert set(lsh.query(m1)) >= {"m1", "m2"}
    assert "m1" in lsh

    lsh.remove("m1")
    assert "m1" not in lsh

    # pickle round-trip reconnects (reference storage.py:929-932)
    lsh2 = pickle.loads(pickle.dumps(lsh))
    assert lsh2.b == lsh.b and lsh2.r == lsh.r


def test_query_buffer_and_query_batch_on_redis(fake_redis_module):
    """add_to_query_buffer / collect_query_buffer and the vectorized
    query_batch against a storage-backed (buffered) config."""
    import numpy as np

    from datasketch_tpu import MinHash, MinHashLSH

    rng = np.random.RandomState(7)
    ms = []
    for i in range(12):
        m = MinHash(num_perm=128)
        m.update_batch(
            [b"t%d" % t for t in rng.choice(200, size=30, replace=False)]
        )
        ms.append(m)
    lsh = MinHashLSH(
        threshold=0.5,
        num_perm=128,
        storage_config={"type": "redis", "redis": {}, "basename": b"qb"},
    )
    with lsh.insertion_session() as session:
        for i, m in enumerate(ms):
            session.insert("k%d" % i, m)
    # buffered query path: intersection-across-buffered-queries semantics
    lsh.add_to_query_buffer(ms[0])
    res = lsh.collect_query_buffer()
    assert "k0" in res
    assert sorted(res) == sorted(lsh.query(ms[0]))
    # batched query path equals scalar queries on redis storage
    batch = lsh.query_batch(ms)
    for i in range(12):
        assert sorted(batch[i]) == sorted(lsh.query(ms[i])), i
