"""Device-path HNSW query parity with the host implementation."""

import numpy as np
import pytest

from datasketch_tpu import HNSW
from datasketch_tpu.ops import hnsw_ops


def _build_index(n=300, d=16, seed=5):
    rng = np.random.RandomState(seed)
    pts = rng.randn(n, d).astype(np.float32)

    def l2(x, y):
        return float(np.linalg.norm(x - y))

    def batch_l2(q, m):
        return np.linalg.norm(np.asarray(m) - q, axis=1)

    index = HNSW(distance_func=l2, batch_distance_func=batch_l2, m=8,
                 ef_construction=100)
    for i in range(n):
        index.insert(i, pts[i])
    return index, pts, rng


def test_export_and_batch_query_recall():
    index, pts, rng = _build_index()
    graph = hnsw_ops.export_graph(index)
    assert graph.n == len(pts)

    q_idx = rng.choice(len(pts), size=20, replace=False)
    queries = pts[q_idx]
    device_res = hnsw_ops.batch_query(graph, queries, k=10, ef=64, metric="l2")

    hits = 0
    for qi, res in zip(q_idx, device_res):
        host = index.query(pts[qi], k=10, ef=64)
        host_keys = {k for k, _ in host}
        dev_keys = {k for k, _ in res}
        assert int(qi) in dev_keys  # self-recall
        hits += len(host_keys & dev_keys)
        # distances ascending
        ds = [d for _, d in res]
        assert ds == sorted(ds)
    assert hits / (20 * 10) > 0.85  # device beam ~= host beam


def test_batch_query_masks_soft_deleted():
    index, pts, rng = _build_index(n=100)
    index.remove(3)  # soft delete
    graph = hnsw_ops.export_graph(index)
    res = hnsw_ops.batch_query(graph, pts[3:4], k=5, ef=32, metric="l2")[0]
    assert all(k != 3 for k, _ in res)


def test_minhash_jaccard_metric():
    rng = np.random.RandomState(0)
    index, pts, _ = _build_index(n=50, d=32)
    graph = hnsw_ops.export_graph(index)
    sigs = (pts * 1000).astype(np.uint32)
    graph2 = hnsw_ops.DeviceGraph(
        points=hnsw_ops.jnp.asarray(sigs),
        adj0=graph.adj0,
        upper_nodes=graph.upper_nodes,
        upper_adj=graph.upper_adj,
        entry=graph.entry,
        keys=graph.keys,
    )  # deleted defaults to None -> treated as all-alive
    res = hnsw_ops.batch_query(graph2, sigs[:2], k=3, ef=16,
                               metric="minhash_jaccard")
    assert res[0][0][0] == 0 and res[0][0][1] == 0.0  # identical sig, dist 0


def test_unknown_metric_raises():
    with pytest.raises(ValueError):
        hnsw_ops._distance_fn("bogus")
