"""MinHashLSHForest tests (model: /root/reference/test/test_lshforest.py)."""

import numpy as np
import pytest

from datasketch_tpu import MinHash, MinHashLSHForest

from .utils import fake_hash_func


def _mh(values, num_perm=128):
    m = MinHash(num_perm, hashfunc=fake_hash_func)
    m.update_batch(values)
    return m


class TestMinHashLSHForest:
    def test_init_validation(self):
        with pytest.raises(ValueError):
            MinHashLSHForest(num_perm=0)
        with pytest.raises(ValueError):
            MinHashLSHForest(num_perm=128, l=0)
        with pytest.raises(ValueError):
            MinHashLSHForest(num_perm=8, l=16)
        f = MinHashLSHForest(num_perm=128, l=8)
        assert f.k == 16

    def test_unindexed_is_empty(self):
        forest = MinHashLSHForest(num_perm=32)
        forest.add("a", _mh(range(50), 32))
        assert forest.is_empty()
        assert forest.query(_mh(range(50), 32), 1) == []
        forest.index()
        assert not forest.is_empty()

    def test_duplicate_add_raises(self):
        forest = MinHashLSHForest(num_perm=32)
        forest.add("a", _mh(range(50), 32))
        with pytest.raises(ValueError):
            forest.add("a", _mh(range(50), 32))

    def test_topk_contains_self(self):
        forest = MinHashLSHForest(num_perm=128)
        rng = np.random.RandomState(0)
        docs = {}
        for i in range(30):
            vals = [int(x) for x in rng.randint(0, 2**31, 60)]
            docs[f"d{i}"] = vals
            forest.add(f"d{i}", _mh(vals))
        forest.index()
        for key, vals in list(docs.items())[:10]:
            res = forest.query(_mh(vals), 5)
            assert key in res
            assert len(res) <= 5

    def test_query_validation(self):
        forest = MinHashLSHForest(num_perm=32)
        forest.add("a", _mh(range(10), 32))
        forest.index()
        with pytest.raises(ValueError):
            forest.query(_mh(range(10), 32), 0)
        with pytest.raises(ValueError):
            forest.query(_mh(range(10), 16), 3)

    def test_hashvalue_roundtrip(self):
        """get_minhash_hashvalues reconstructs the indexed signature
        (lshforest.py:130-155 parity)."""
        forest = MinHashLSHForest(num_perm=64, l=8)
        m = _mh(range(100), 64)
        forest.add("a", m)
        got = forest.get_minhash_hashvalues("a")
        np.testing.assert_array_equal(got, m.hashvalues)
        with pytest.raises(KeyError):
            forest.get_minhash_hashvalues("nope")

    def test_contains(self):
        forest = MinHashLSHForest(num_perm=32)
        forest.add("a", _mh(range(10), 32))
        assert "a" in forest
        assert "b" not in forest

    def test_works_with_weighted_minhash(self):
        from datasketch_tpu import WeightedMinHashGenerator

        gen = WeightedMinHashGenerator(100, sample_size=128)
        forest = MinHashLSHForest(num_perm=128)
        rng = np.random.RandomState(1)
        vs = [rng.randint(1, 10, 100).astype(float) for _ in range(10)]
        wms = []
        for i, v in enumerate(vs):
            wm = gen.minhash(v)
            # WeightedMinHash hashvalues are (k, t) rows; flatten view works
            # with the forest byte-prefix API the same way the reference does.
            forest.add(f"w{i}", wm)
            wms.append(wm)
        forest.index()
        res = forest.query(wms[0], 3)
        assert "w0" in res
