"""ShardedHNSW over the virtual CPU mesh.

Completes SURVEY §2.4's sharding treatment for the ANN graph family
(reference query semantics: ``/root/reference/datasketch/hnsw.py:605-780``;
scale-out analogue: the shared-storage backends of ``storage.py:819+``):
per-shard NSW beam search, k-wide all_gather merge, tombstones, and
checkpoint interop across mesh shapes.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from datasketch_tpu.models.tpu_hnsw import TpuHNSW
from datasketch_tpu.parallel import ShardedHNSW


def _mesh(n):
    return Mesh(np.array(jax.devices()[:n]).reshape(n), ("data",))


def _clustered(n=240, dim=16, seed=11):
    rng = np.random.RandomState(seed)
    centers = rng.standard_normal((8, dim)).astype(np.float32) * 4
    pts = (
        centers[rng.randint(0, 8, size=n)]
        + rng.standard_normal((n, dim)).astype(np.float32)
    )
    return pts.astype(np.float32)


def _brute_topk(pts, q, k):
    d = np.sqrt(((pts - q[None, :]) ** 2).sum(axis=1))
    return set(np.argsort(d)[:k])


def test_sharded_hnsw_recall_vs_exact():
    pts = _clustered()
    idx = ShardedHNSW(_mesh(4), "l2", m=8, ef=48)
    idx.index(list(range(len(pts))), pts)
    hits = total = 0
    for qi in range(0, 40):
        got = {k for k, _ in idx.query(pts[qi], k=10)}
        want = _brute_topk(pts, pts[qi], 10)
        hits += len(got & want)
        total += 10
    assert hits / total >= 0.85, hits / total


def test_sharded_hnsw_matches_single_chip_quality():
    pts = _clustered(n=180)
    single = TpuHNSW("l2", m=8, ef=48)
    single.index(list(range(len(pts))), pts)
    sharded = ShardedHNSW(_mesh(4), "l2", m=8, ef=48)
    sharded.index(list(range(len(pts))), pts)
    s_hits = h_hits = 0
    for qi in range(20):
        want = _brute_topk(pts, pts[qi], 5)
        h_hits += len({k for k, _ in single.query(pts[qi], k=5)} & want)
        s_hits += len({k for k, _ in sharded.query(pts[qi], k=5)} & want)
    # sharded recall must not trail the single-chip graph materially
    assert s_hits >= h_hits - 5, (s_hits, h_hits)
    # distances are exact (same metric), top-1 is self for both
    row = sharded.query(pts[3], k=3)
    assert row[0][0] == 3 and row[0][1] == pytest.approx(0.0)


def test_sharded_hnsw_incremental_and_duplicate():
    pts = _clustered(n=96)
    idx = ShardedHNSW(_mesh(2), "l2", m=6, ef=32)
    idx.index(list(range(64)), pts[:64])
    idx.index(list(range(64, 96)), pts[64:])
    assert len(idx) == 96
    row = idx.query(pts[80], k=3)
    assert row[0][0] == 80
    with pytest.raises(ValueError, match="already exists"):
        idx.index([5], pts[:1])
    with pytest.raises(ValueError, match="already exists"):
        idx.index([200, 200], pts[:2])


def test_sharded_hnsw_remove_and_rebuild_drops_tombstones():
    pts = _clustered(n=80)
    idx = ShardedHNSW(_mesh(2), "l2", m=6, ef=32)
    idx.index(list(range(80)), pts)
    idx.remove(7)
    assert 7 not in idx and len(idx) == 79
    assert all(k != 7 for k, _ in idx.query(pts[7], k=10))
    with pytest.raises(ValueError, match="does not exist"):
        idx.remove(7)
    # rebuild must not resurrect the tombstone
    extra = _clustered(n=4, seed=99) + 10.0
    idx.index([100, 101, 102, 103], extra)
    assert 7 not in idx and len(idx) == 83
    assert all(k != 7 for k, _ in idx.query(pts[7], k=10))
    assert idx.query(extra[0], k=1)[0][0] == 100


def test_sharded_hnsw_save_load_other_mesh(tmp_path):
    pts = _clustered(n=96)
    idx = ShardedHNSW(_mesh(4), "l2", m=6, ef=32)
    idx.index(list(range(96)), pts)
    idx.remove(5)
    path = str(tmp_path / "g.npz")
    idx.save(path)
    re2 = ShardedHNSW.load(path, _mesh(2))
    assert len(re2) == 95 and re2.n_shards == 2
    assert 5 not in re2
    row = re2.query(pts[10], k=3)
    assert row[0][0] == 10
    assert all(k != 5 for k, _ in re2.query(pts[5], k=10))


def test_sharded_hnsw_upper_levels_exercised():
    # local_n=128, level_ratio=4, m=6 -> one upper routing level per shard
    # (m=4 fragments this 8-cluster corpus into disconnected components —
    # equally poor unsharded, verified against a direct batch_query)
    pts = _clustered(n=256, seed=21)
    idx = ShardedHNSW(_mesh(2), "l2", m=6, ef=32, level_ratio=4)
    idx.index(list(range(256)), pts)
    assert idx.status()["levels"] >= 2
    ok = sum(1 for i in range(16) if idx.query(pts[i], k=3)[0][0] == i)
    assert ok >= 13


def test_sharded_hnsw_empty_and_errors():
    idx = ShardedHNSW(_mesh(2), "l2", m=4, ef=16)
    assert idx.is_empty() and len(idx) == 0
    assert idx.query_batch(np.zeros((3, 8), np.float32), k=5) == [[], [], []]
    with pytest.raises(ValueError, match="k must be positive"):
        idx.query_batch(np.zeros((1, 8), np.float32), k=0)
    with pytest.raises(ValueError, match="at least 2"):
        ShardedHNSW(_mesh(2), m=1)
    with pytest.raises(ValueError, match="empty"):
        idx.save("/tmp/never.npz")


def test_sharded_hnsw_minhash_jaccard_metric():
    from datasketch_tpu import MinHash

    rng = np.random.RandomState(4)
    sets = [
        rng.choice(5000, 120, replace=False).astype(np.uint32)
        for _ in range(64)
    ]
    sigs = np.asarray(
        MinHash.bulk_signatures(sets, num_perm=64, hashfunc="device"),
        dtype=np.float32,
    )
    idx = ShardedHNSW(_mesh(2), "minhash_jaccard", m=6, ef=32)
    idx.index(list(range(64)), sigs)
    row = idx.query(sigs[9], k=3)
    assert row[0][0] == 9 and row[0][1] == pytest.approx(0.0)


def test_sharded_hnsw_query_stream():
    pts = _clustered(n=64)
    idx = ShardedHNSW(_mesh(2), "l2", m=6, ef=32)
    idx.index(list(range(64)), pts)
    batches = [pts[i : i + 8] for i in range(0, 32, 8)]
    out = [row for res in idx.query_stream(batches, k=3) for row in res]
    assert len(out) == 32
    assert sum(1 for i, row in enumerate(out) if row[0][0] == i) >= 31
