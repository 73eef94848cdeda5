"""Regressions from the round-2 self-review (code-review findings).

Each test pins one confirmed defect: buffered-merge corruption, tombstone
resurrection, tuple-key persistence, dropped constructor params, width
mismatches at num_perm % l != 0, and device-targeted health probes.
"""

import numpy as np
import jax
import pytest

from datasketch_tpu import (
    HNSW,
    MinHash,
    TpuHNSW,
    TpuMinHashLSH,
    TpuMinHashLSHForest,
)
from datasketch_tpu.parallel import ShardedMinHashLSH, make_mesh


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8
    return make_mesh(8)


def _minhashes(n, num_perm=128, seed=0):
    rng = np.random.RandomState(seed)
    sigs = rng.randint(0, 1 << 32, size=(n, num_perm), dtype=np.uint64)
    return [MinHash(num_perm=num_perm, hashvalues=row) for row in sigs], sigs


def test_sharded_merge_flushes_pending_tpu_lsh(mesh):
    """merge(other) with a TpuMinHashLSH holding buffered inserts must
    flush them first — otherwise keys register without signature rows."""
    mhs, _ = _minhashes(24, seed=3)
    sharded = ShardedMinHashLSH(mesh, threshold=0.5, num_perm=128)
    sharded.index([f"s{i}" for i in range(20)], mhs[:20])
    other = TpuMinHashLSH(threshold=0.5, num_perm=128)
    other.index([f"o{i}" for i in range(3)], mhs[20:23])
    other.insert("pending0", mhs[23])  # buffered; no query flushed it
    sharded.merge(other)
    assert "pending0" in sharded
    # its signature row must actually be searchable
    res = sharded.query_batch([mhs[23]])
    assert "pending0" in res[0]
    # and removable without walking off the alive array
    sharded.remove("pending0")
    assert "pending0" not in sharded


def _small_hnsw(n=24, dim=8, seed=0):
    rng = np.random.RandomState(seed)
    pts = rng.random_sample((n, dim)).astype(np.float32)
    host = HNSW(distance_func=lambda a, b: float(np.linalg.norm(a - b)))
    for i in range(n):
        host.insert(i, pts[i])
    return host, pts


def test_tpu_hnsw_from_hnsw_excludes_tombstones():
    host, pts = _small_hnsw()
    host.remove(3)  # soft delete
    ix = TpuHNSW.from_hnsw(host, distance_metric="l2")
    assert 3 not in ix
    assert len(ix) == len(pts) - 1
    hits = ix.query(pts[3], k=5)
    assert all(k != 3 for k, _ in hits)


def test_tpu_hnsw_rebuild_does_not_resurrect_tombstones():
    host, pts = _small_hnsw()
    host.remove(3)
    ix = TpuHNSW.from_hnsw(host, distance_metric="l2")
    rng = np.random.RandomState(9)
    ix.index([100, 101], rng.random_sample((2, pts.shape[1])).astype(np.float32))
    assert 3 not in ix
    hits = ix.query(pts[3], k=5)
    assert all(k != 3 for k, _ in hits)


def test_tpu_forest_tuple_keys_save_load(tmp_path):
    mhs, _ = _minhashes(12, seed=1)
    keys = [("part", i) for i in range(12)]
    f = TpuMinHashLSHForest(num_perm=128, l=8)
    f.index(keys, mhs)
    path = str(tmp_path / "forest.npz")
    f.save(path)
    back = TpuMinHashLSHForest.load(path)
    assert ("part", 3) in back
    assert back.query(mhs[3], 3)[0] == ("part", 3)


def test_tpu_hnsw_tuple_keys_save_load(tmp_path):
    rng = np.random.RandomState(2)
    pts = rng.random_sample((16, 8)).astype(np.float32)
    ix = TpuHNSW(distance_metric="l2")
    ix.index([("k", i) for i in range(16)], pts)
    path = str(tmp_path / "hnsw.npz")
    ix.save(path)
    back = TpuHNSW.load(path)
    assert ("k", 5) in back
    assert back.query(pts[5], k=1)[0][0] == ("k", 5)


def test_sharded_tuple_keys_save_load(tmp_path, mesh):
    mhs, _ = _minhashes(20, seed=4)
    sh = ShardedMinHashLSH(mesh, threshold=0.5, num_perm=128)
    sh.index([("doc", i) for i in range(20)], mhs)
    path = str(tmp_path / "sharded.npz")
    sh.save(path)
    back = ShardedMinHashLSH.load(path, mesh)
    assert ("doc", 7) in back
    assert ("doc", 7) in back.query_batch([mhs[7]])[0]


def test_tpu_ensemble_tuple_keys_and_weights_save_load(tmp_path):
    from datasketch_tpu.models.tpu_ensemble import TpuMinHashLSHEnsemble

    rng = np.random.RandomState(5)
    entries = []
    for i in range(12):
        size = int(rng.randint(20, 200))
        m = MinHash(num_perm=128)
        m.update_batch([bytes([j % 251, i]) for j in range(size)])
        entries.append((("e", i), m, size))
    ens = TpuMinHashLSHEnsemble(
        threshold=0.6, num_perm=128, num_part=4, weights=(0.2, 0.8)
    )
    ens.index(entries)
    path = str(tmp_path / "ens.npz")
    ens.save(path)
    back = TpuMinHashLSHEnsemble.load(path)
    # weights shape the (b, r) tables; a silent default would re-tune queries
    assert back.weights == (0.2, 0.8)
    assert back.rs == ens.rs
    np.testing.assert_array_equal(
        np.asarray(back.params, dtype=object).tolist(),
        np.asarray(ens.params, dtype=object).tolist(),
    )
    assert ("e", 3) in back
    hits = list(back.query(entries[3][1], entries[3][2]))
    assert ("e", 3) in hits


def test_tpu_forest_non_divisible_num_perm():
    """num_perm=100, l=8 -> k*l = 96: reference-valid 96-wide minhashes
    must index and query (the effective width is k*l, not num_perm)."""
    num_perm, l = 100, 8
    f = TpuMinHashLSHForest(num_perm=num_perm, l=l)
    width = f.k * f.l
    assert width == 96
    mhs, _ = _minhashes(10, num_perm=width, seed=6)
    f.add("a0", mhs[0])
    f.index([f"b{i}" for i in range(1, 10)], mhs[1:])
    assert f.query(mhs[0], 3)[0] == "a0"
    # full-length minhashes keep working too (sliced to width)
    full, _ = _minhashes(1, num_perm=num_perm, seed=7)
    f.index(["full0"], full)
    assert f.query(full[0], 3)[0] == "full0"


def test_tpu_forest_save_flushes_pending(tmp_path):
    mhs, _ = _minhashes(6, seed=8)
    f = TpuMinHashLSHForest(num_perm=128, l=8)
    f.index([f"d{i}" for i in range(5)], mhs[:5])
    f.add("staged", mhs[5])  # staged but never index()ed
    path = str(tmp_path / "forest2.npz")
    f.save(path)
    back = TpuMinHashLSHForest.load(path)
    assert "staged" in back
    assert back.query(mhs[5], 3)[0] == "staged"


def test_healthcheck_subprocess_targets_device():
    """The isolate=True probe must honor device=: it probes by device id
    in the child process (and reports a bogus id instead of silently
    probing the default device)."""
    from datasketch_tpu.utils import device_healthcheck

    res = device_healthcheck(timeout=120.0, device=jax.devices()[1])
    assert res["ok"], res

    class FakeDevice:
        id = 10**6

    res = device_healthcheck(timeout=120.0, device=FakeDevice())
    assert not res["ok"] and "no device with id" in res["error"]


def test_tpu_lsh_index_after_buffered_insert_keeps_mapping():
    """index() must flush buffered insert()s first: base positions count
    self._keys, so unflushed rows previously landed AFTER the batch's
    rows while their keys sat BEFORE them — swapping every mapping."""
    mhs, sigs = _minhashes(4, seed=11)
    lsh = TpuMinHashLSH(threshold=0.5, num_perm=128)
    lsh.insert("a", mhs[0])          # buffered
    lsh.index(["b"], [mhs[1]])       # previously corrupted the mapping
    for key, m in [("a", mhs[0]), ("b", mhs[1])]:
        top = lsh.top_k([m], k=1)[0]
        assert top[0][0] == key, (key, top)


def test_sharded_index_rejects_in_batch_duplicates(mesh):
    mhs, _ = _minhashes(2, seed=12)
    sh = ShardedMinHashLSH(mesh, threshold=0.5, num_perm=128)
    with pytest.raises(ValueError, match="already exists"):
        sh.index(["a", "a"], mhs)


def test_tpu_hnsw_index_rejects_pending_duplicate():
    rng = np.random.RandomState(13)
    pts = rng.random_sample((4, 8)).astype(np.float32)
    ix = TpuHNSW(distance_metric="l2")
    ix.add("a", pts[0])
    with pytest.raises(ValueError, match="already exists"):
        ix.index(["a"], pts[1:2])
    # the pending buffer survives the failed call
    assert "a" in ix and len(ix) == 1
    assert ix.query(pts[0], k=1)[0][0] == "a"


def test_save_load_without_npz_suffix(tmp_path):
    """save('x') writes 'x.npz' (numpy appends); load('x') must find it."""
    mhs, _ = _minhashes(8, seed=14)
    f = TpuMinHashLSHForest(num_perm=128, l=8)
    f.index([f"k{i}" for i in range(8)], mhs)
    f.save(str(tmp_path / "forest_noext"))
    assert "k0" in TpuMinHashLSHForest.load(str(tmp_path / "forest_noext"))

    rng = np.random.RandomState(15)
    pts = rng.random_sample((8, 4)).astype(np.float32)
    ix = TpuHNSW(distance_metric="l2")
    ix.index(list(range(8)), pts)
    ix.save(str(tmp_path / "hnsw_noext"))
    assert 0 in TpuHNSW.load(str(tmp_path / "hnsw_noext"))


def test_bloom_host_device_positions_agree():
    """TpuMinHashLSHBloom must probe the same bit positions as the host
    BloomTable (both docstrings promise one scheme) so bitmaps are
    cross-checkable."""
    from datasketch_tpu.models.lsh_bloom import BloomTable, TpuMinHashLSHBloom

    host = BloomTable(item_count=1000, fp=0.01, band_size=8)
    dev = TpuMinHashLSHBloom(threshold=0.5, num_perm=128, n=1000, fp=0.01)
    assert host.num_bits == dev.num_bits
    assert host.num_hashes == dev.num_hashes
    keys = np.array([12345, 2**63 + 17, 999, 0], dtype=np.uint64)
    host_pos = host._positions(keys)
    dev_pos = np.asarray(dev._positions(keys))
    np.testing.assert_array_equal(host_pos, dev_pos)


def test_hnsw_from_points_cosine():
    rng = np.random.RandomState(16)
    pts = rng.random_sample((32, 8)).astype(np.float32)
    ix = HNSW.from_points(pts, metric="cosine")
    hits = ix.query(pts[3], k=3)
    assert hits[0][0] == 3 and hits[0][1] == pytest.approx(0.0, abs=1e-6)


def test_redis_namespace_glob_isolation():
    """Band names embed struct.pack('>H', i): name bytes like '*' (42),
    '?' (63), '[' (91) previously made keys() match OTHER buckets."""
    import struct
    import sys
    import types

    from tests.fake_redis import FakeRedis

    mod = types.ModuleType("redis")
    mod.Redis = FakeRedis
    saved = sys.modules.get("redis")
    sys.modules["redis"] = mod
    try:
        from datasketch_tpu.storage import unordered_storage

        cfg = {"type": "redis", "redis": {"host": "fake", "port": 0}}
        stores = {}
        for i in (41, 42, 63, 91, 92, 93):
            name = b"base_bucket_" + struct.pack(">H", i)
            stores[i] = unordered_storage(cfg, name=name)
        shared = stores[42]._redis
        for st in stores.values():
            st._redis = shared  # one fake server for all buckets
        for i, st in stores.items():
            st.insert(b"k%d" % i, b"v")
        for i, st in stores.items():
            assert st.keys() == [b"k%d" % i], i
            assert st.size() == 1
            assert st.itemcounts() == {b"k%d" % i: 1}
    finally:
        if saved is None:
            sys.modules.pop("redis", None)
        else:
            sys.modules["redis"] = saved


def test_redis_getmany_pipelined_and_key_type_errors():
    import sys
    import types

    from tests.fake_redis import FakeRedis

    mod = types.ModuleType("redis")
    mod.Redis = FakeRedis
    saved = sys.modules.get("redis")
    sys.modules["redis"] = mod
    try:
        from datasketch_tpu.storage import ordered_storage, unordered_storage

        cfg = {"type": "redis", "redis": {"host": "fake", "port": 0}}
        ls = ordered_storage(cfg, name=b"gm")
        ls.insert(b"a", b"1", b"2")
        ls.insert(b"b", b"3")
        assert ls.getmany(b"a", b"b", b"missing") == [
            [b"1", b"2"], [b"3"], []
        ]
        us = unordered_storage(cfg, name=b"gs")
        us.insert(b"x", b"1")
        got = us.getmany(b"x", b"y")
        assert got[0] == {b"1"} and got[1] == set()
        with pytest.raises(TypeError, match="bytes"):
            ls.insert(5, b"v")
        with pytest.raises(TypeError, match="bytes"):
            us.get("strkey")
    finally:
        if saved is None:
            sys.modules.pop("redis", None)
        else:
            sys.modules["redis"] = saved


def test_async_get_subset_counts_set_semantics():
    import asyncio

    from datasketch_tpu import AsyncMinHashLSH

    async def go():
        async with AsyncMinHashLSH(
            threshold=0.5, num_perm=128,
            storage_config={"type": "aiodict"},
        ) as lsh:
            m = MinHash(num_perm=128)
            m.update_batch([b"a", b"b", b"c"])
            await lsh.insert("m1", m)
            dup = await lsh.get_subset_counts("m1", "m1")
            single = await lsh.get_subset_counts("m1")
            assert dup == single
            assert all(all(v == 1 for v in t.values()) for t in single)

    asyncio.run(go())


def test_sharded_save_load_without_npz_suffix(tmp_path, mesh):
    mhs, _ = _minhashes(12, seed=21)
    sh = ShardedMinHashLSH(mesh, threshold=0.5, num_perm=128)
    sh.index([f"n{i}" for i in range(12)], mhs)
    sh.save(str(tmp_path / "sh_noext"))
    back = ShardedMinHashLSH.load(str(tmp_path / "sh_noext"), mesh)
    assert "n3" in back


def test_failover_reraises_caller_errors_without_tripping():
    """A bad QUERY (wrong num_perm) must raise, not flip the replica
    into degraded host serving."""
    from datasketch_tpu import FailoverIndex
    from tests.test_serving import _FixedMonitor, _build_index

    index, mhs, _ = _build_index(n=16)
    fo = FailoverIndex(index, monitor=_FixedMonitor([]))
    bad = MinHash(num_perm=8)
    with pytest.raises(ValueError, match="length"):
        fo.top_k([bad], k=3)
    assert not fo.serving_from_host
    assert fo.monitor.consecutive_failures == 0
    # well-formed queries still ride the device path
    assert fo.top_k([mhs[0]], k=1)[0][0][0] == "doc0"
    assert fo.last_path == "device"


def test_failover_device_failure_recorded_in_history():
    from datasketch_tpu import FailoverIndex
    from tests.test_serving import _FixedMonitor, _build_index

    index, mhs, _ = _build_index(n=16)
    fo = FailoverIndex(index, monitor=_FixedMonitor([]))
    index.top_k = lambda *a, **k: (_ for _ in ()).throw(RuntimeError("gone"))
    fo.top_k(mhs[:1], k=2)
    st = fo.status()["monitor"]
    assert st["consecutive_failures"] == 1
    assert st["checks"] == 1  # history stays consistent with the counter


def test_bloom_load_refuses_old_probe_scheme(tmp_path):
    """A bitmap probed under an older scheme loads 'cleanly' but returns
    false negatives for everything — load must refuse instead."""
    from datasketch_tpu import TpuMinHashLSHBloom

    bloom = TpuMinHashLSHBloom(threshold=0.5, num_perm=128, n=100, fp=0.01)
    path = str(tmp_path / "bloom.npz")
    bloom.save(path)
    assert TpuMinHashLSHBloom.load(path).num_bits == bloom.num_bits
    # strip the scheme marker, simulating a pre-versioning save
    data = dict(np.load(path, allow_pickle=False))
    data.pop("probe_scheme")
    np.savez_compressed(path, **data)
    with pytest.raises(ValueError, match="probe scheme"):
        TpuMinHashLSHBloom.load(path)


def test_failover_host_path_honors_return_scores(mesh):
    """Result SHAPE must not change mid-failover: return_scores=False on
    a sharded index yields plain keys on BOTH paths."""
    from datasketch_tpu import FailoverIndex
    from tests.test_serving import _FixedMonitor

    mhs, _ = _minhashes(16, seed=41)
    sh = ShardedMinHashLSH(mesh, threshold=0.3, num_perm=128, bucket_cap=64)
    sh.index([f"d{i}" for i in range(16)], mhs)
    fo = FailoverIndex(sh, monitor=_FixedMonitor([False]))
    dev_rows = fo.top_k(mhs[:2], k=3, return_scores=False)
    assert fo.last_path == "device"
    fo.check()
    host_rows = fo.top_k(mhs[:2], k=3, return_scores=False)
    assert fo.last_path == "host"
    for rows in (dev_rows, host_rows):
        assert all(isinstance(k, str) for row in rows for k in row)
    assert host_rows[0][0] == "d0"


def test_healthcheck_default_timeouts_per_mode(monkeypatch):
    """None resolves to the mode-appropriate bound: 10s for the warm
    in-process thread, 120s for the subprocess (whose bound must cover
    interpreter + jax import + a cold first dispatch)."""
    import time as _time

    import datasketch_tpu.utils.health as health

    real_thread = health.threading.Thread

    class HangingThread(real_thread):
        def run(self):
            _time.sleep(60)

    monkeypatch.setattr(health.threading, "Thread", HangingThread)
    t0 = _time.perf_counter()
    res = health.device_healthcheck(isolate=False)  # default timeout
    assert 9 <= _time.perf_counter() - t0 < 20
    assert "exceeded 10.0s" in res["error"]
