"""AsyncRedis* storages against an in-process async fake client."""

import asyncio
import sys
import types

import pytest

from tests.fake_redis import FakeRedis


class FakeAsyncRedis:
    """Async facade over the sync fake; pipeline queues then applies."""

    def __init__(self, **kwargs):
        self._r = FakeRedis()

    def pipeline(self):
        return FakeAsyncPipeline(self._r)

    async def aclose(self):
        return None

    def __getattr__(self, name):
        fn = getattr(self._r, name)

        async def call(*a, **k):
            return fn(*a, **k)

        return call


class FakeAsyncPipeline:
    def __init__(self, client):
        self._client = client
        self._ops = []

    def __getattr__(self, name):
        async def queue(*args, **kwargs):
            self._ops.append((name, args, kwargs))

        return queue

    async def execute(self):
        ops, self._ops = self._ops, []
        for name, args, kwargs in ops:
            getattr(self._client, name)(*args, **kwargs)
        return [True] * len(ops)


@pytest.fixture()
def fake_aioredis(monkeypatch):
    redis_mod = types.ModuleType("redis")
    asyncio_mod = types.ModuleType("redis.asyncio")
    asyncio_mod.Redis = FakeAsyncRedis
    redis_mod.asyncio = asyncio_mod
    monkeypatch.setitem(sys.modules, "redis", redis_mod)
    monkeypatch.setitem(sys.modules, "redis.asyncio", asyncio_mod)


def test_async_redis_storages(fake_aioredis):
    from datasketch_tpu.aio.storage import (
        async_ordered_storage,
        async_unordered_storage,
    )

    async def go():
        ls = async_ordered_storage(
            {"type": "aioredis", "redis": {}}, name=b"t", batch_size=2
        )
        await ls.init()
        await ls.insert(b"k", b"a", b"b")
        assert await ls.get(b"k") == [b"a", b"b"]
        assert await ls.has_key(b"k")
        assert await ls.itemcounts() == {b"k": 2}
        # buffered writes flush at batch_size
        await ls.insert(b"k2", b"v", buffer=True)
        await ls.insert(b"k3", b"v", buffer=True)
        assert await ls.get(b"k2") == [b"v"]
        await ls.remove_val(b"k", b"a")
        assert await ls.get(b"k") == [b"b"]
        await ls.remove(b"k")
        assert not await ls.has_key(b"k")
        await ls.close()

        us = async_unordered_storage(
            {"type": "aioredis", "redis": {}}, name=b"u"
        )
        await us.init()
        await us.insert(b"k", b"v", b"v")
        assert await us.get(b"k") == {b"v"}
        assert await us.itemcounts() == {b"k": 1}
        await us.close()

    asyncio.run(go())


def test_async_lsh_over_fake_redis(fake_aioredis):
    from datasketch_tpu import AsyncMinHashLSH, MinHash

    async def go():
        def mh(tokens):
            m = MinHash(num_perm=128)
            m.update_batch([t.encode() for t in tokens])
            return m

        m1, m2 = mh(["a", "b", "c", "d"]), mh(["a", "b", "c", "e"])
        async with AsyncMinHashLSH(
            threshold=0.5,
            num_perm=128,
            storage_config={"type": "aioredis", "redis": {}, "basename": b"t"},
        ) as lsh:
            assert lsh.prepickle  # aioredis default
            await lsh.insert("m1", m1)
            await lsh.insert("m2", m2)
            res = await lsh.query(m1)
            assert "m1" in res and "m2" in res
            await lsh.remove("m1")
            assert not await lsh.has_key("m1")

    asyncio.run(go())


def test_async_redis_namespace_glob_isolation(fake_aioredis):
    """Band names embed struct.pack('>H', i) bytes: names containing glob
    metacharacters ('*' at 42, '?' at 63, '[' at 91, '\\' at 92) must not
    match other buckets' keys (the KEYS pattern is backslash-escaped)."""
    import struct

    from datasketch_tpu.aio.storage import async_unordered_storage

    async def go():
        shared = None
        stores = {}
        for i in (41, 42, 63, 91, 92):
            name = b"base_bucket_" + struct.pack(">H", i)
            st = async_unordered_storage(
                {"type": "aioredis", "redis": {}}, name=name
            )
            await st.init()
            if shared is None:
                shared = st._redis
            else:
                st._redis = shared  # one fake server for every bucket
            stores[i] = st
        for i, st in stores.items():
            await st.insert(b"k%d" % i, b"v")
        for i, st in stores.items():
            assert await st.keys() == [b"k%d" % i], i
            assert await st.size() == 1
            assert await st.itemcounts() == {b"k%d" % i: 1}

    asyncio.run(go())
