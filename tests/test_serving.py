"""FailoverIndex: health-routed device/host serving."""

import numpy as np
import pytest

from datasketch_tpu import FailoverIndex, MinHash, TpuMinHashLSH
from datasketch_tpu.serving import host_topk_scan
from datasketch_tpu.utils.health import HealthMonitor


def _build_index(n=64, num_perm=32, seed=0):
    rng = np.random.RandomState(seed)
    sigs = rng.randint(0, 1 << 32, size=(n, num_perm), dtype=np.uint64)
    # plant near-duplicates: doc i+n/2 shares most slots with doc i
    half = n // 2
    sigs[half:] = sigs[:half]
    flip = rng.randint(0, num_perm, size=(half, 4))
    for i in range(half):
        sigs[half + i, flip[i]] = rng.randint(0, 1 << 32, size=4)
    mhs = [MinHash(num_perm=num_perm, hashvalues=row) for row in sigs]
    index = TpuMinHashLSH(threshold=0.3, num_perm=num_perm, bucket_cap=64)
    index.index([f"doc{i}" for i in range(n)], mhs)
    return index, mhs, sigs


def _exact_topk_keys(sigs, qi, k):
    scores = (sigs == sigs[qi][None, :]).mean(axis=1)
    order = np.argsort(-scores, kind="stable")[:k]
    return {f"doc{i}" for i in order}, scores


class _FixedMonitor(HealthMonitor):
    """Monitor whose checks are scripted instead of probing a device."""

    def __init__(self, outcomes):
        super().__init__(max_failures=1)
        self._outcomes = list(outcomes)

    def check(self):
        ok = self._outcomes.pop(0) if self._outcomes else True
        res = {"ok": ok, "latency_s": 0.001 if ok else None,
               "error": None if ok else "wedged"}
        self.last_result = res
        self.consecutive_failures = 0 if ok else self.consecutive_failures + 1
        return res


def test_host_topk_scan_matches_bruteforce():
    rng = np.random.RandomState(1)
    sigs = rng.randint(0, 100, size=(20, 16)).astype(np.uint32)
    q = sigs[:3]
    ids, scores = host_topk_scan(sigs, q, k=5)
    for qi in range(3):
        ref = (sigs == q[qi][None, :]).mean(axis=1)
        assert ids[qi, 0] == qi and scores[qi, 0] == 1.0
        np.testing.assert_allclose(scores[qi], np.sort(ref)[::-1][:5])


def test_host_topk_scan_respects_alive_and_empty():
    sigs = np.arange(40, dtype=np.uint32).reshape(10, 4)
    alive = np.ones(10, dtype=bool)
    alive[3] = False
    ids, _ = host_topk_scan(sigs, sigs[3:4], k=3, alive=alive)
    assert 3 not in ids[0]
    ids, scores = host_topk_scan(np.zeros((0, 4), np.uint32), sigs[:1], k=3)
    assert (ids == -1).all() and (scores == 0).all()


def test_failover_routes_to_device_when_healthy():
    index, mhs, sigs = _build_index()
    fo = FailoverIndex(index, monitor=_FixedMonitor([True]))
    fo.check()
    rows = fo.top_k(mhs[:4], k=5)
    assert fo.last_path == "device"
    assert not fo.serving_from_host
    for i, row in enumerate(rows):
        assert row[0][0] == f"doc{i}"


def test_failover_host_path_after_monitor_trips():
    index, mhs, sigs = _build_index()
    fo = FailoverIndex(index, monitor=_FixedMonitor([False]))
    fo.check()
    assert fo.serving_from_host
    rows = fo.top_k(mhs[:4], k=5)
    assert fo.last_path == "host"
    for i, row in enumerate(rows):
        keys = [kk for kk, _ in row]
        expected, scores = _exact_topk_keys(sigs, i, 5)
        # self first, planted near-duplicate present
        assert keys[0] == f"doc{i}"
        assert f"doc{(i + len(sigs) // 2) % len(sigs)}" in keys
        # host scan is exact: matches brute force up to ties
        tied = {f"doc{j}" for j in range(len(sigs))
                if scores[j] >= min(s for _, s in row) - 1e-12}
        assert set(keys) <= tied


def test_failover_threshold_query_host_exact():
    index, mhs, sigs = _build_index()
    fo = FailoverIndex(index, monitor=_FixedMonitor([False]))
    fo.check()
    res = fo.query_batch(mhs[:3], threshold=0.5, return_scores=True)
    assert fo.last_path == "host"
    for i, row in enumerate(res):
        scores = (sigs == sigs[i][None, :]).mean(axis=1)
        expected = {f"doc{j}" for j in np.nonzero(scores >= 0.5)[0]}
        assert {kk for kk, _ in row} == expected
        assert all(s >= 0.5 for _, s in row)
    # single-query facade
    assert f"doc0" in fo.query(mhs[0], threshold=0.5)


def test_failover_on_device_exception_then_resume():
    index, mhs, sigs = _build_index()
    fo = FailoverIndex(index, monitor=_FixedMonitor([]))

    def boom(*a, **kw):
        raise RuntimeError("device gone")

    real_top_k = index.top_k
    index.top_k = boom
    rows = fo.top_k(mhs[:2], k=3)
    assert fo.serving_from_host and fo.last_path == "host"
    assert rows[0][0][0] == "doc0"
    # recovery is explicit
    index.top_k = real_top_k
    fo.resume_device()
    assert not fo.serving_from_host
    rows = fo.top_k(mhs[:2], k=3)
    assert fo.last_path == "device"


def test_failover_snapshot_tracks_removals():
    index, mhs, sigs = _build_index(n=16)
    index.remove("doc0")
    fo = FailoverIndex(index, monitor=_FixedMonitor([False]))
    fo.check()
    rows = fo.top_k([mhs[0]], k=4)
    assert all(kk != "doc0" for kk, _ in rows[0])
    st = fo.status()
    assert st["serving_from_host"] and st["snapshot_rows"] == 16


def test_failover_without_snapshot_raises():
    index, mhs, _ = _build_index(n=8)
    fo = FailoverIndex(index, monitor=_FixedMonitor([False]), snapshot=False)
    fo.check()
    with pytest.raises(RuntimeError, match="snapshot"):
        fo.top_k([mhs[0]], k=2)


def test_failover_wraps_sharded_index():
    """FailoverIndex works over a mesh-sharded index too: device path
    while healthy, exact host scan from the cross-shard snapshot once
    the monitor trips."""
    import jax

    from datasketch_tpu.parallel import ShardedMinHashLSH, make_mesh

    assert len(jax.devices()) == 8
    mesh = make_mesh(8)
    index, mhs, sigs = None, None, None
    rng = np.random.RandomState(31)
    raw = rng.randint(0, 1 << 32, size=(24, 32), dtype=np.uint64)
    mhs = [MinHash(num_perm=32, hashvalues=row) for row in raw]
    index = ShardedMinHashLSH(mesh, threshold=0.3, num_perm=32, bucket_cap=64)
    index.index([f"doc{i}" for i in range(24)], mhs)
    index.remove("doc5")

    fo = FailoverIndex(index, monitor=_FixedMonitor([True]))
    fo.check()
    rows = fo.top_k(mhs[:3], k=3)
    assert fo.last_path == "device"
    assert rows[0][0][0] == "doc0"

    fo.monitor._outcomes = [False]
    fo.check()
    rows = fo.top_k(mhs[:3], k=3)
    assert fo.last_path == "host"
    for i, row in enumerate(rows):
        assert row[0][0] == f"doc{i}"
    top5 = fo.top_k([mhs[5]], k=3)[0]
    assert all(kk != "doc5" for kk, _ in top5)  # tombstone respected


def test_failover_wraps_sharded_index():
    """FailoverIndex duck-types over anything with top_k/query_batch/
    host_snapshot — including the mesh-sharded index: when the monitor
    trips, queries answer from the host snapshot, exactly."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    from datasketch_tpu import FailoverIndex, MinHash
    from datasketch_tpu.parallel import ShardedMinHashLSH
    from datasketch_tpu.utils.health import HealthMonitor

    rng = np.random.RandomState(31)
    docs = [rng.choice(20000, 100, replace=False).astype(np.uint32)
            for _ in range(48)]
    sigs = MinHash.bulk_signatures(docs, num_perm=128, hashfunc="device")
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("data",))
    index = ShardedMinHashLSH(mesh, threshold=0.5, num_perm=128,
                              bucket_cap=32)
    index.index(list(range(48)), sigs)
    fo = FailoverIndex(index, monitor=HealthMonitor(max_failures=1))
    queries = [MinHash(hashvalues=r, hashfunc="device") for r in sigs[:4]]
    dev_rows = fo.top_k(queries, k=3)
    assert fo.last_path == "device"
    # trip the monitor: queries must keep answering, now from the host
    fo.monitor.consecutive_failures = 99
    host_rows = fo.top_k(queries, k=3)
    assert fo.last_path == "host"
    for d, h in zip(dev_rows, host_rows):
        assert d[0][0] == h[0][0]  # top-1 agrees (both exact-scan here)
    thr = fo.query_batch(queries)
    assert all(i in row for i, row in enumerate(thr))
