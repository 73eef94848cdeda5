"""AsyncMinHashLSH tests over the in-memory aiodict backend.

Mirrors the coverage of ``/root/reference/test/aio/test_lsh.py`` (insert /
query / remove / sessions / prepickle / _query_b) without requiring
MongoDB/Redis; async tests run via ``asyncio.run`` (no plugin).
"""

import asyncio

import pytest

from datasketch_tpu import AsyncMinHashLSH, MinHash
from datasketch_tpu.aio.storage import (
    async_ordered_storage,
    async_unordered_storage,
)


def _mh(tokens, num_perm=128):
    m = MinHash(num_perm=num_perm)
    m.update_batch([t.encode() for t in tokens])
    return m


def run(coro):
    return asyncio.run(coro)


def test_init_and_params():
    async def go():
        async with AsyncMinHashLSH(threshold=0.8, num_perm=128) as lsh:
            assert lsh.b * lsh.r <= 128
            assert await lsh.is_empty()

    run(go())


def test_insert_query_remove():
    async def go():
        m1 = _mh(["a", "b", "c", "d"])
        m2 = _mh(["a", "b", "c", "e"])
        m3 = _mh(["x", "y", "z", "w"])
        async with AsyncMinHashLSH(threshold=0.5, num_perm=128) as lsh:
            await lsh.insert("m1", m1)
            await lsh.insert("m2", m2)
            await lsh.insert("m3", m3)
            assert await lsh.has_key("m1")
            assert not await lsh.is_empty()

            res = await lsh.query(m1)
            assert "m1" in res and "m2" in res and "m3" not in res

            with pytest.raises(ValueError):
                await lsh.insert("m1", m1)  # duplicate
            with pytest.raises(ValueError):
                await lsh.query(_mh(["a"], num_perm=64))  # wrong len

            await lsh.remove("m2")
            assert not await lsh.has_key("m2")
            res = await lsh.query(m2)
            assert "m2" not in res
            with pytest.raises(ValueError):
                await lsh.remove("nope")

    run(go())


def test_sessions_flush_on_exit():
    async def go():
        mhs = [_mh([f"t{i}", f"t{i+1}", f"t{i+2}"]) for i in range(10)]
        lsh = await AsyncMinHashLSH(threshold=0.5, num_perm=128)
        async with lsh.insertion_session(batch_size=100) as s:
            for i, m in enumerate(mhs):
                await s.insert(f"k{i}", m)
        for i, m in enumerate(mhs):
            assert f"k{i}" in await lsh.query(m)
        async with lsh.deletion_session(batch_size=100) as s:
            await s.remove("k0")
        assert not await lsh.has_key("k0")
        await lsh.close()

    run(go())


def test_prepickle_roundtrip():
    async def go():
        m = _mh(["a", "b", "c"])
        async with AsyncMinHashLSH(
            threshold=0.5, num_perm=128, prepickle=True
        ) as lsh:
            await lsh.insert(("tuple", "key"), m)
            res = await lsh.query(m)
            assert ("tuple", "key") in res

    run(go())


def test_query_b_and_counts():
    async def go():
        m1 = _mh(["a", "b", "c", "d"])
        async with AsyncMinHashLSH(threshold=0.5, num_perm=128) as lsh:
            await lsh.insert("m1", m1)
            cands = await lsh._query_b(m1, lsh.b)
            assert "m1" in cands
            with pytest.raises(ValueError):
                await lsh._query_b(m1, lsh.b + 1)
            counts = await lsh.get_counts()
            assert len(counts) == lsh.b
            sub = await lsh.get_subset_counts("m1")
            assert all(sum(c.values()) == 1 for c in sub)

    run(go())


def test_await_form_initializes():
    async def go():
        lsh = await AsyncMinHashLSH(threshold=0.5, num_perm=128)
        await lsh.insert("k", _mh(["a", "b"]))
        assert await lsh.has_key("k")
        await lsh.close()

    run(go())


def test_storage_factories_and_gating():
    async def go():
        s = async_ordered_storage({"type": "aiodict"}, name=b"t")
        await s.init()
        await s.insert(b"k", b"v1", b"v2")
        assert await s.get(b"k") == [b"v1", b"v2"]
        assert await s.itemcounts() == {b"k": 2}
        u = async_unordered_storage({"type": "aiodict"}, name=b"t2")
        await u.init()
        await u.insert(b"k", b"v", b"v")
        assert await u.get(b"k") == {b"v"}
        await u.remove_val(b"k", b"v")
        assert not await u.has_key(b"k")

    run(go())
    with pytest.raises(ValueError):
        async_ordered_storage({"type": "bogus"})
    # gated backends raise ImportError without their drivers installed
    for tp in ("aioredis", "aiomongo"):
        try:
            async_ordered_storage({"type": tp, "redis": {}, "mongo": {}})
        except ImportError:
            pass


def test_experimental_shim():
    import warnings

    import datasketch_tpu.experimental as exp

    # Another test may have imported the subpackage already, which binds
    # the attribute and bypasses the PEP 562 path — unbind to exercise it.
    exp.__dict__.pop("aio", None)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        aio = exp.aio
        assert any(issubclass(x.category, DeprecationWarning) for x in w)
    assert aio.AsyncMinHashLSH is AsyncMinHashLSH


def test_experimental_aio_lsh_module_shim():
    import warnings

    import datasketch_tpu.experimental.aio.lsh as shim

    for name in ("AsyncMinHashLSHDeleteSession",):
        shim.__dict__.pop(name, None)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            cls = getattr(shim, name)
            assert any(issubclass(x.category, DeprecationWarning) for x in w)
        import datasketch_tpu.aio.lsh as real

        assert cls is getattr(real, name)
    with pytest.raises(AttributeError):
        shim.does_not_exist


def test_cassandra_gated():
    from datasketch_tpu.storage import ordered_storage

    with pytest.raises(ImportError):
        ordered_storage({"type": "cassandra", "cassandra": {}}, name=b"x")


def test_bytes_keys_required_without_prepickle_and_pickle_roundtrip():
    """Reference parity (aio/lsh.py:67,111-126,251-254): service-backed
    storages reject non-bytes keys when prepickle=False, and a pickled
    index reconnects to the SAME namespaces."""
    import pickle as _pickle

    async def go():
        async with AsyncMinHashLSH(
            threshold=0.5, num_perm=16,
            storage_config={"type": "aiodict"},
        ) as lsh:
            # aiodict is exempt (host dict analogue): str keys fine
            m = _mh(["a", "b"], num_perm=16)
            await lsh.insert("str-key", m)
            assert "str-key" in await lsh.query(m)
            # pickle round trip preserves identity and params
            lsh2 = _pickle.loads(_pickle.dumps(lsh))
            assert (lsh2.b, lsh2.r, lsh2.h) == (lsh.b, lsh.r, lsh.h)
            assert lsh2._basename == lsh._basename
            # delete_session (reference spelling) works
            await lsh._init_storages()
            async with lsh.delete_session(batch_size=10) as s:
                await s.remove("str-key")
            assert not await lsh.has_key("str-key")

    run(go())


def test_aiodict_pickle_preserves_data():
    """The in-memory backend's data lives IN the storages: pickling must
    carry it (service backends re-fetch server-side on reconnect)."""
    import pickle as _pickle

    async def go():
        async with AsyncMinHashLSH(
            threshold=0.5, num_perm=16,
            storage_config={"type": "aiodict"},
        ) as lsh:
            m = _mh(["a", "b", "c"], num_perm=16)
            await lsh.insert("k1", m)
            blob = _pickle.dumps(lsh)
        async with _pickle.loads(blob) as lsh2:
            assert await lsh2.has_key("k1")
            assert "k1" in await lsh2.query(m)

    run(go())
