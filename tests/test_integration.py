"""Opt-in integration tests against LIVE services.

Parity with ``/root/reference/test/test_integration.py:10-60``: skipped
unless the matching env var is ``true`` —

    DO_TEST_REDIS=true      (redis at localhost:6379)
    DO_TEST_CASSANDRA=true  (cassandra at 127.0.0.1:9042)
    DO_TEST_MONGO=true      (mongodb at localhost:27017, motor installed)

Everything here also runs against in-process fakes in
test_redis_storage.py / test_cassandra_storage.py / test_aio_*_storage.py;
these tests exist to validate the real drivers end to end.
"""

import asyncio
import os

import numpy as np
import pytest

from datasketch_tpu import MinHash, MinHashLSH

DO_TEST_REDIS = os.environ.get("DO_TEST_REDIS") == "true"
DO_TEST_CASSANDRA = os.environ.get("DO_TEST_CASSANDRA") == "true"
DO_TEST_MONGO = os.environ.get("DO_TEST_MONGO") == "true"

STORAGE_CONFIG_REDIS = {
    "basename": b"lsh_test",
    "type": "redis",
    "redis": {"host": "localhost", "port": 6379},
}

STORAGE_CONFIG_CASSANDRA = {
    "basename": b"lsh_test",
    "type": "cassandra",
    "cassandra": {
        "seeds": ["127.0.0.1"],
        "keyspace": "lsh_test",
        "replication": {"class": "SimpleStrategy", "replication_factor": "1"},
        "drop_keyspace": True,
        "drop_tables": True,
    },
}


def _minhashes(n=20, num_perm=128, seed=11):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        m = MinHash(num_perm=num_perm)
        m.update_batch(
            [b"t%d" % t for t in rng.choice(400, size=50, replace=False)]
        )
        out.append(m)
    return out


def _exercise_lsh(storage_config):
    ms = _minhashes()
    lsh = MinHashLSH(
        threshold=0.5, num_perm=128, storage_config=storage_config,
        prepickle=True,
    )
    with lsh.insertion_session() as session:
        for i, m in enumerate(ms):
            session.insert("key%d" % i, m)
    for i in range(5):
        assert "key%d" % i in lsh.query(ms[i]), i
    batch = lsh.query_batch(ms[:5])
    for i in range(5):
        assert sorted(batch[i]) == sorted(lsh.query(ms[i]))
    assert lsh.get_counts()
    lsh.remove("key0")
    assert "key0" not in lsh
    lsh.add_to_query_buffer(ms[1])
    assert "key1" in lsh.collect_query_buffer()


@pytest.mark.skipif(not DO_TEST_REDIS, reason="DO_TEST_REDIS != true")
def test_redis_live():
    _exercise_lsh(STORAGE_CONFIG_REDIS)


@pytest.mark.skipif(not DO_TEST_CASSANDRA, reason="DO_TEST_CASSANDRA != true")
def test_cassandra_live():
    _exercise_lsh(STORAGE_CONFIG_CASSANDRA)


@pytest.mark.skipif(not DO_TEST_CASSANDRA, reason="DO_TEST_CASSANDRA != true")
def test_cassandra_live_buffered_and_counts():
    from datasketch_tpu.storage import ordered_storage

    ls = ordered_storage(STORAGE_CONFIG_CASSANDRA, name=b"it_buf")
    ls.buffer_size = 50
    for i in range(120):
        ls.insert(b"k", b"v%d" % i, buffer=True)
    ls.empty_buffer()
    assert ls.get(b"k") == [b"v%d" % i for i in range(120)]
    assert ls.itemcounts() == {b"k": 120}


@pytest.mark.skipif(not DO_TEST_REDIS, reason="DO_TEST_REDIS != true")
def test_async_redis_live():
    from datasketch_tpu.aio import AsyncMinHashLSH

    async def run():
        ms = _minhashes(n=8)
        cfg = {
            "type": "aioredis",
            "basename": b"lsh_test",
            "redis": {"host": "localhost", "port": 6379},
        }
        async with AsyncMinHashLSH(
            threshold=0.5, num_perm=128, storage_config=cfg
        ) as lsh:
            for i, m in enumerate(ms):
                await lsh.insert("akey%d" % i, m)
            res = await lsh.query(ms[3])
            assert "akey3" in res

    asyncio.run(run())


@pytest.mark.skipif(not DO_TEST_MONGO, reason="DO_TEST_MONGO != true")
def test_async_mongo_live():
    from datasketch_tpu.aio import AsyncMinHashLSH

    async def run():
        ms = _minhashes(n=8)
        cfg = {
            "type": "aiomongo",
            "basename": b"lsh_test",
            "mongo": {"host": "localhost", "port": 27017,
                      "db": "lsh_test"},
        }
        async with AsyncMinHashLSH(
            threshold=0.5, num_perm=128, storage_config=cfg
        ) as lsh:
            for i, m in enumerate(ms):
                await lsh.insert("mkey%d" % i, m)
            res = await lsh.query(ms[2])
            assert "mkey2" in res

    asyncio.run(run())
