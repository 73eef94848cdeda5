"""Device-built kNN/NSW graph: exactness of adjacency, query recall."""

import numpy as np

from datasketch_tpu.ops import hnsw_ops, knn_graph


def test_knn_adjacency_exact():
    rng = np.random.RandomState(0)
    pts = rng.randn(100, 8).astype(np.float32)
    adj = np.asarray(knn_graph.knn_adjacency(pts, k=5, metric="l2", tile=32))
    assert adj.shape == (100, 5)
    d = np.linalg.norm(pts[:, None, :] - pts[None, :, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    for i in range(100):
        want = set(np.argsort(d[i])[:5])
        assert set(adj[i]) == want, i


def test_nsw_graph_query_recall():
    rng = np.random.RandomState(1)
    pts = rng.randn(400, 16).astype(np.float32)
    graph = knn_graph.build_nsw_graph(pts, m=10, metric="l2", tile=64)
    assert graph.n == 400 and graph.deleted.shape == (400,)

    q_idx = rng.choice(400, size=20, replace=False)
    res = hnsw_ops.batch_query(graph, pts[q_idx], k=10, ef=64, metric="l2")
    d = np.linalg.norm(pts[:, None, :] - pts[None, :, :], axis=-1)
    hits = 0
    for qi, row in zip(q_idx, res):
        assert row[0][0] == int(qi) and row[0][1] < 1e-5  # self first
        truth = set(np.argsort(d[qi])[:10])
        hits += len(truth & {k for k, _ in row})
    assert hits / (20 * 10) > 0.8


def test_nsw_graph_custom_keys():
    rng = np.random.RandomState(2)
    pts = rng.randn(50, 8).astype(np.float32)
    keys = ["doc%d" % i for i in range(50)]
    graph = knn_graph.build_nsw_graph(pts, keys=keys, m=6, metric="l2")
    res = hnsw_ops.batch_query(graph, pts[:1], k=3, ef=32, metric="l2")[0]
    assert res[0][0] == "doc0"


def test_hnsw_from_points_is_fully_mutable():
    import numpy as np

    from datasketch_tpu import HNSW

    rng = np.random.RandomState(4)
    pts = rng.randn(300, 16).astype(np.float32)
    index = HNSW.from_points(pts, m=8, metric="l2")
    assert len(index) == 300

    # query parity with an incrementally built index
    res = index.query(pts[7], k=5, ef=64)
    assert res[0][0] == 7 and res[0][1] < 1e-6
    ds = [d for _, d in res]
    assert ds == sorted(ds)

    # full mutability: insert, soft/hard remove, repair
    index.insert(999, rng.randn(16).astype(np.float32))
    assert 999 in index
    index.remove(7)
    assert 7 not in index
    assert all(k != 7 for k, _ in index.query(pts[7], k=5, ef=64))
    index.remove(8, hard=True)
    assert all(k != 8 for k, _ in index.query(pts[8], k=5, ef=64))

    # custom keys + reversed edges variant
    idx2 = HNSW.from_points(pts[:50], keys=[f"k{i}" for i in range(50)],
                            m=6, metric="l2", reversed_edges=True)
    assert idx2.query(pts[3], k=1, ef=32)[0][0] == "k3"
    idx2.remove("k3", hard=True)
    assert "k3" not in idx2
