"""AsyncMongo* storages + AsyncMinHashLSH over an in-process fake motor."""

import asyncio
import sys
import types

import pytest

from tests import fake_motor


@pytest.fixture()
def fake_motor_modules(monkeypatch):
    fake_motor.FakeMotorClient._dbs = {}  # isolate state per test
    motor_mod = types.ModuleType("motor")
    motor_asyncio = types.ModuleType("motor.motor_asyncio")
    motor_asyncio.AsyncIOMotorClient = fake_motor.FakeMotorClient
    motor_mod.motor_asyncio = motor_asyncio
    pymongo_mod = types.ModuleType("pymongo")
    pymongo_mod.InsertOne = fake_motor.FakeInsertOne
    pymongo_mod.UpdateOne = fake_motor.FakeUpdateOne
    pymongo_mod.DeleteMany = fake_motor.FakeDeleteMany
    pymongo_mod.DeleteOne = fake_motor.FakeDeleteOne
    monkeypatch.setitem(sys.modules, "motor", motor_mod)
    monkeypatch.setitem(sys.modules, "motor.motor_asyncio", motor_asyncio)
    monkeypatch.setitem(sys.modules, "pymongo", pymongo_mod)


def test_async_mongo_storages(fake_motor_modules):
    from datasketch_tpu.aio.storage import (
        async_ordered_storage,
        async_unordered_storage,
    )

    async def go():
        ls = async_ordered_storage(
            {"type": "aiomongo", "mongo": {"db": "t"}}, name=b"x",
            batch_size=2,
        )
        await ls.init()
        await ls.insert(b"k", b"a", b"b")
        assert await ls.get(b"k") == [b"a", b"b"]
        assert await ls.has_key(b"k")
        assert await ls.itemcounts() == {b"k": 2}
        # buffered path flushes at batch_size
        await ls.insert(b"k2", b"v", buffer=True)
        await ls.insert(b"k3", b"v", buffer=True)
        assert await ls.get(b"k2") == [b"v"]
        await ls.remove_val(b"k", b"a")
        assert await ls.get(b"k") == [b"b"]
        await ls.remove(b"k")
        assert not await ls.has_key(b"k")
        await ls.close()

        us = async_unordered_storage(
            {"type": "aiomongo", "mongo": {"db": "t"}}, name=b"u"
        )
        await us.init()
        await us.insert(b"k", b"v", b"v")  # set semantics via upsert
        assert await us.get(b"k") == {b"v"}
        assert await us.itemcounts() == {b"k": 1}
        await us.close()

    asyncio.run(go())


def test_async_lsh_over_fake_mongo(fake_motor_modules):
    from datasketch_tpu import AsyncMinHashLSH, MinHash

    async def go():
        def mh(tokens):
            m = MinHash(num_perm=128)
            m.update_batch([t.encode() for t in tokens])
            return m

        m1, m2 = mh(["a", "b", "c", "d"]), mh(["a", "b", "c", "e"])
        # prepickle=True: non-bytes keys with a service backend otherwise
        # raise TypeError (reference aio/lsh.py:251-254 semantics)
        async with AsyncMinHashLSH(
            threshold=0.5,
            num_perm=128,
            prepickle=True,
            storage_config={"type": "aiomongo", "mongo": {"db": "lshdb"},
                            "basename": b"t"},
        ) as lsh:
            await lsh.insert("m1", m1)
            await lsh.insert("m2", m2)
            res = await lsh.query(m1)
            assert "m1" in res and "m2" in res
            async with lsh.insertion_session(batch_size=4) as s:
                await s.insert("m3", mh(["x", "y", "z"]))
            assert await lsh.has_key("m3")
            await lsh.remove("m1")
            assert not await lsh.has_key("m1")

    asyncio.run(go())
