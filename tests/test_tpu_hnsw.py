"""TpuHNSW facade: build, query parity with ops, tombstones, persistence."""

import numpy as np
import pytest

from datasketch_tpu import TpuHNSW


def _points(n=300, d=16, seed=0):
    rng = np.random.RandomState(seed)
    return rng.rand(n, d).astype(np.float32)


def test_build_query_self_recall():
    pts = _points()
    ix = TpuHNSW(distance_metric="l2", m=8, ef=48)
    keys = [f"p{i}" for i in range(len(pts))]
    ix.index(keys, pts)
    res = ix.query_batch(pts[:10], k=5)
    for i, row in enumerate(res):
        assert row[0][0] == f"p{i}" and row[0][1] < 1e-6
        dists = [d for _, d in row]
        assert dists == sorted(dists)
    assert ix.query(pts[0], k=5) == res[0]
    st = ix.status()
    assert st["n"] == 300 and st["levels"] >= 1


def test_add_buffer_and_remove():
    pts = _points(120)
    ix = TpuHNSW(m=8, ef=32)
    ix.index([f"p{i}" for i in range(100)], pts[:100])
    for i in range(100, 120):
        ix.add(f"p{i}", pts[i])
    assert len(ix) == 120 and "p110" in ix
    with pytest.raises(ValueError):
        ix.add("p110", pts[0])
    row = ix.query(pts[110], k=3)  # triggers the lazy rebuild
    assert row[0][0] == "p110"
    ix.remove("p110")
    with pytest.raises(ValueError):
        ix.remove("p110")
    row = ix.query(pts[110], k=3)
    assert all(k != "p110" for k, _ in row)
    assert "p110" not in ix


def test_stream_matches_batch():
    pts = _points(150)
    ix = TpuHNSW(m=8, ef=32)
    ix.index(list(range(150)), pts)
    qs = pts[:8]
    sync = ix.query_batch(qs, k=4)
    out = list(ix.query_stream([qs, qs], k=4, depth=3))
    assert out == [sync, sync]
    empty = TpuHNSW()
    assert empty.query_batch(qs, k=4) == [[] for _ in range(8)]


def test_save_load_roundtrip(tmp_path):
    pts = _points(200)
    ix = TpuHNSW(m=8, ef=32)
    ix.index([f"p{i}" for i in range(200)], pts)
    ix.remove("p5")
    path = str(tmp_path / "g.npz")
    ix.save(path)
    back = TpuHNSW.load(path)
    assert len(back) == 199 and "p5" not in back
    a = ix.query_batch(pts[:6], k=4)
    b = back.query_batch(pts[:6], k=4)
    assert a == b
    with pytest.raises(ValueError):
        TpuHNSW().save(str(tmp_path / "e.npz"))


def test_from_hnsw_snapshot():
    from datasketch_tpu import HNSW

    pts = _points(80)
    host = HNSW(distance_func=lambda x, y: float(np.linalg.norm(x - y)))
    for i, p in enumerate(pts):
        host[i] = p
    host.remove(3)  # soft delete must carry over
    ix = TpuHNSW.from_hnsw(host, distance_metric="l2", ef=32)
    row = ix.query(pts[3], k=4)
    assert all(k != 3 for k, _ in row)
    row0 = ix.query(pts[0], k=4)
    assert row0[0][0] == 0
