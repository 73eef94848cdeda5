"""HNSW tests.

Coverage model: /root/reference/test/test_hnsw.py — insert/search with
result-sortedness invariant, upsert, update, merge, pickle/copy, soft/hard
remove with graph checks; whole suite re-run under L2, Jaccard, and
reversed-edge variants (test_hnsw.py:254-302 pattern).
"""

import pickle

import numpy as np
import pytest

from datasketch_tpu import HNSW


def l2_distance(x, y):
    return float(np.linalg.norm(x - y))


def l2_batch_distance(q, pts):
    return np.linalg.norm(pts - q, axis=1)


def jaccard_distance(x, y):
    return 1.0 - float(len(np.intersect1d(x, y, assume_unique=False))) / float(
        len(np.union1d(x, y))
    )


class TestHNSW:
    distance = staticmethod(l2_distance)
    reversed_edges = False

    def _data(self, n=60, dim=8, seed=0):
        return np.random.RandomState(seed).random_sample((n, dim))

    def _index(self, **kw):
        return HNSW(
            distance_func=self.distance,
            m=8,
            ef_construction=100,
            reversed_edges=self.reversed_edges,
            **kw,
        )

    def test_insert_and_query_sorted(self):
        data = self._data()
        index = self._index()
        for i, d in enumerate(data):
            index.insert(i, d)
        assert len(index) == len(data)
        for i in (0, 10, 30):
            res = index.query(data[i], k=10)
            assert len(res) == 10
            dists = [d for _, d in res]
            assert dists == sorted(dists)
            assert res[0][0] == i  # exact point is its own NN
            assert res[0][1] == pytest.approx(0.0, abs=1e-9)

    def test_recall_vs_bruteforce(self):
        data = self._data(n=120)
        index = self._index()
        index.update({i: d for i, d in enumerate(data)})
        hits = 0
        for qi in range(20):
            truth = sorted(
                range(len(data)), key=lambda j: self.distance(data[qi], data[j])
            )[:5]
            got = [k for k, _ in index.query(data[qi], k=5)]
            hits += len(set(truth) & set(got))
        assert hits / (20 * 5) > 0.8

    def test_mapping_api(self):
        data = self._data(n=10)
        index = self._index()
        for i, d in enumerate(data):
            index[i] = d
        assert 0 in index
        np.testing.assert_array_equal(index[0], data[0])
        assert index.get("nope") is None
        assert set(index.keys()) == set(range(10))
        assert len(list(index.values())) == 10
        assert len(list(index.items())) == 10
        with pytest.raises(KeyError):
            index["nope"]
        sd = index.setdefault(0, data[1])
        np.testing.assert_array_equal(sd, data[0])
        with pytest.raises(ValueError):
            index.setdefault(77, None)

    def test_upsert_updates_point(self):
        data = self._data(n=30)
        index = self._index()
        index.update({i: d for i, d in enumerate(data)})
        new_point = data[0] + 10.0
        index.insert(5, new_point)
        np.testing.assert_array_equal(index[5], new_point)
        res = index.query(new_point, k=3)
        assert res[0][0] == 5

    def test_soft_remove(self):
        data = self._data(n=30)
        index = self._index()
        index.update({i: d for i, d in enumerate(data)})
        index.remove(7)
        assert 7 not in index
        assert len(index) == 29
        res = index.query(data[7], k=10)
        assert 7 not in [k for k, _ in res]
        # repeat soft remove is a no-op while other points remain
        index.remove(7)
        # pop of removed key raises
        with pytest.raises(KeyError):
            index.pop(7)

    def test_hard_remove_and_clean(self):
        data = self._data(n=40)
        index = self._index()
        index.update({i: d for i, d in enumerate(data)})
        index.remove(3, hard=True)
        assert 3 not in index._nodes
        with pytest.raises(KeyError):
            index.remove(3, hard=True)
        # graph contains no dangling references to 3
        for layer in index._graphs:
            for node in layer:
                assert 3 not in layer[node]
        for i in range(4, 10):
            index.remove(i)
        index.clean()
        assert all(i not in index._nodes for i in range(4, 10))
        res = index.query(data[20], k=5)
        assert len(res) == 5

    def test_remove_entry_point(self):
        data = self._data(n=20)
        index = self._index()
        index.update({i: d for i, d in enumerate(data)})
        ep = index._entry_point
        index.remove(ep, hard=True)
        assert index._entry_point != ep
        assert len(index.query(data[0], k=3)) == 3

    def test_remove_all_clears(self):
        data = self._data(n=5)
        index = self._index()
        index.update({i: d for i, d in enumerate(data)})
        for i in range(5):
            if i in index:
                index.remove(i)
        # removing the last live point clears the index
        assert len(index) == 0

    def test_pop_popitem(self):
        data = self._data(n=10)
        index = self._index()
        index.update({i: d for i, d in enumerate(data)})
        p = index.pop(4)
        np.testing.assert_array_equal(p, data[4])
        key, point = index.popitem()
        assert key not in index
        with pytest.raises(KeyError):
            self._index().popitem()

    def test_copy_merge_eq(self):
        data = self._data(n=25)
        index = self._index()
        index.update({i: d for i, d in enumerate(data)})
        cp = index.copy()
        assert cp == index
        cp.insert("x", data[0] + 5)
        assert cp != index
        other = self._index()
        other.update({100 + i: d + 1 for i, d in enumerate(data[:5])})
        merged = index.merge(other)
        assert all(k in merged for k in range(25))
        assert all(100 + i in merged for i in range(5))

    def test_pickle(self):
        data = self._data(n=20)
        index = self._index()
        index.update({i: d for i, d in enumerate(data)})
        index2 = pickle.loads(pickle.dumps(index))
        assert set(index2.keys()) == set(index.keys())
        r1 = index.query(data[0], k=5)
        r2 = index2.query(data[0], k=5)
        assert r1 == r2

    def test_query_empty_raises(self):
        with pytest.raises(ValueError):
            self._index().query(np.zeros(8), k=1)


class TestHNSWReversedEdges(TestHNSW):
    reversed_edges = True


class TestHNSWJaccard(TestHNSW):
    distance = staticmethod(jaccard_distance)

    def _data(self, n=60, dim=10, seed=0):
        return np.random.RandomState(seed).randint(0, 100, size=(n, dim))

    def test_upsert_updates_point(self):
        data = self._data(n=30)
        index = self._index()
        index.update({i: d for i, d in enumerate(data)})
        new_point = data[1].copy()
        index.insert(5, new_point)
        np.testing.assert_array_equal(index[5], new_point)

    def test_insert_and_query_sorted(self):
        data = self._data()
        index = self._index()
        for i, d in enumerate(data):
            index.insert(i, d)
        for i in (0, 10, 30):
            res = index.query(data[i], k=10)
            dists = [d for _, d in res]
            assert dists == sorted(dists)
            assert res[0][1] == pytest.approx(0.0, abs=1e-9)


class TestHNSWBatchDistance(TestHNSW):
    """Same behavior with a vectorized batch distance function."""

    def _index(self, **kw):
        return HNSW(
            distance_func=l2_distance,
            batch_distance_func=l2_batch_distance,
            m=8,
            ef_construction=100,
            **kw,
        )
