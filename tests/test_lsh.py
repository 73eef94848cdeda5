"""MinHashLSH tests.

Coverage model: /root/reference/test/test_lsh.py — optimizer monotonicity,
band-key length invariance, insert/query/remove/sessions/merge/counts/
pickle — using dict storage (the mocked-Redis analogue is covered by the
dict backend since both sit behind the same Storage interface).
"""

import pickle

import numpy as np
import pytest

from datasketch_tpu import MinHash, MinHashLSH
from datasketch_tpu.models.lsh import _optimal_param

from .utils import fake_hash_func


def _mh(values, num_perm=128):
    m = MinHash(num_perm, hashfunc=fake_hash_func)
    for v in values:
        m.update(v)
    return m


class TestOptimalParam:
    def test_weights_shift_br(self):
        """Pattern from test_lsh.py:21-28: more FP weight -> larger b."""
        b1, r1 = _optimal_param(0.5, 128, 0.1, 0.9)
        b2, r2 = _optimal_param(0.5, 128, 0.9, 0.1)
        assert b1 > b2
        assert r1 < r2

    def test_respects_num_perm(self):
        for num_perm in (16, 64, 128):
            b, r = _optimal_param(0.5, num_perm, 0.5, 0.5)
            assert b * r <= num_perm


class TestMinHashLSH:
    def test_init(self):
        lsh = MinHashLSH(threshold=0.8)
        assert lsh.is_empty()
        b1, r1 = lsh.b, lsh.r
        lsh = MinHashLSH(threshold=0.8, weights=(0.2, 0.8))
        b2, r2 = lsh.b, lsh.r
        assert b1 < b2
        assert r1 > r2

    def test_init_params(self):
        lsh = MinHashLSH(num_perm=128, params=(16, 8))
        assert (lsh.b, lsh.r) == (16, 8)
        with pytest.raises(ValueError):
            MinHashLSH(num_perm=128, params=(32, 8))
        with pytest.raises(ValueError):
            MinHashLSH(threshold=1.2)
        with pytest.raises(ValueError):
            MinHashLSH(num_perm=1)
        with pytest.raises(ValueError):
            MinHashLSH(weights=(0.2, 0.3))

    def test_insert_query(self):
        lsh = MinHashLSH(threshold=0.5, num_perm=16)
        m1 = _mh(range(0, 40), 16)
        m2 = _mh(range(10, 50), 16)
        m3 = _mh(range(1000, 1040), 16)
        lsh.insert("a", m1)
        lsh.insert("b", m2)
        lsh.insert("c", m3)
        assert "a" in lsh
        result = lsh.query(m1)
        assert "a" in result
        assert "c" not in result
        with pytest.raises(ValueError):
            lsh.insert("a", m1)  # duplicate
        with pytest.raises(ValueError):
            lsh.query(_mh(range(5), 32))  # wrong length

    def test_band_key_lengths(self):
        """_H length invariance sweep (test_lsh.py:30-51)."""
        for num_perm, b_r in ((128, (32, 4)), (128, (16, 8)), (64, (8, 8))):
            lsh = MinHashLSH(num_perm=num_perm, params=b_r)
            m = _mh(range(100), num_perm)
            Hs = lsh._band_keys(m)
            assert len(Hs) == lsh.b
            assert all(len(H) == lsh.r * 8 for H in Hs)

    def test_remove(self):
        lsh = MinHashLSH(threshold=0.5, num_perm=16)
        m1 = _mh(range(0, 40), 16)
        m2 = _mh(range(10, 50), 16)
        lsh.insert("a", m1)
        lsh.insert("b", m2)
        lsh.remove("a")
        assert "a" not in lsh
        assert "a" not in lsh.query(m1)
        with pytest.raises(ValueError):
            lsh.remove("zzz")

    def test_sessions(self):
        lsh = MinHashLSH(threshold=0.5, num_perm=16)
        data = [(f"k{i}", _mh(range(i, i + 40), 16)) for i in range(10)]
        with lsh.insertion_session() as session:
            for key, m in data:
                session.insert(key, m)
        for key, m in data:
            assert key in lsh.query(m)
        with lsh.deletion_session() as session:
            for key, _ in data[:5]:
                session.remove(key)
        for key, _ in data[:5]:
            assert key not in lsh

    def test_query_buffer(self):
        lsh = MinHashLSH(threshold=0.5, num_perm=16)
        m1 = _mh(range(0, 40), 16)
        m2 = _mh(range(10, 50), 16)
        lsh.insert("a", m1)
        lsh.insert("b", m2)
        lsh.add_to_query_buffer(m1)
        res = lsh.collect_query_buffer()
        assert "a" in res
        # two buffered queries intersect
        lsh.add_to_query_buffer(m1)
        lsh.add_to_query_buffer(m2)
        res = set(lsh.collect_query_buffer())
        assert res == set(lsh.query(m1)) & set(lsh.query(m2))

    def test_merge(self):
        lsh1 = MinHashLSH(threshold=0.5, num_perm=16)
        lsh2 = MinHashLSH(threshold=0.5, num_perm=16)
        m1 = _mh(range(0, 40), 16)
        m2 = _mh(range(1000, 1040), 16)
        lsh1.insert("a", m1)
        lsh2.insert("b", m2)
        lsh1.merge(lsh2)
        assert "a" in lsh1 and "b" in lsh1
        assert "b" in lsh1.query(m2)
        lsh3 = MinHashLSH(threshold=0.5, num_perm=32)
        with pytest.raises(ValueError):
            lsh1.merge(lsh3)

    def test_merge_check_overlap(self):
        lsh1 = MinHashLSH(threshold=0.5, num_perm=16)
        lsh2 = MinHashLSH(threshold=0.5, num_perm=16)
        m1 = _mh(range(0, 40), 16)
        lsh1.insert("a", m1)
        lsh2.insert("a", m1)
        with pytest.raises(ValueError):
            lsh1.merge(lsh2, check_overlap=True)

    def test_get_counts(self):
        lsh = MinHashLSH(threshold=0.5, num_perm=16)
        lsh.insert("a", _mh(range(0, 40), 16))
        lsh.insert("b", _mh(range(10, 50), 16))
        counts = lsh.get_counts()
        assert len(counts) == lsh.b
        assert all(sum(d.values()) == 2 for d in counts)
        sub = lsh.get_subset_counts("a")
        assert all(sum(d.values()) == 1 for d in sub)

    def test_pickle(self):
        lsh = MinHashLSH(threshold=0.5, num_perm=16)
        m1 = _mh(range(0, 40), 16)
        lsh.insert("a", m1)
        lsh2 = pickle.loads(pickle.dumps(lsh))
        assert "a" in lsh2.query(m1)

    def test_insert_batch(self):
        lsh = MinHashLSH(threshold=0.5, num_perm=16)
        keys = [f"k{i}" for i in range(20)]
        ms = [_mh(range(i, i + 30), 16) for i in range(20)]
        lsh.insert_batch(keys, ms)
        for k, m in zip(keys, ms):
            assert k in lsh.query(m)
        res = lsh.query_batch(ms[:3])
        assert len(res) == 3 and all(keys[i] in res[i] for i in range(3))

    def test_recall_on_synthetic(self):
        """End-to-end behavior: similar pairs retrieved, dissimilar not."""
        rng = np.random.RandomState(42)
        base = [int(x) for x in rng.randint(0, 2**31, size=100)]
        lsh = MinHashLSH(threshold=0.5, num_perm=128)
        m_base = _mh(base)
        lsh.insert("base", m_base)
        # 80% overlap doc
        similar = base[:80] + [int(x) for x in rng.randint(0, 2**31, size=20)]
        assert "base" in lsh.query(_mh(similar))
        # disjoint doc
        other = [int(x) for x in rng.randint(2**31, 2**32, size=100)]
        assert "base" not in lsh.query(_mh(other))

    def test_prepickle_bytes_keys(self):
        lsh = MinHashLSH(threshold=0.5, num_perm=16, prepickle=True)
        m1 = _mh(range(0, 40), 16)
        lsh.insert(("tuple", "key"), m1)
        assert ("tuple", "key") in lsh.query(m1)


def test_insert_batch_weighted_minhash_and_in_batch_dups():
    import numpy as np
    import pytest

    from datasketch_tpu import MinHashLSH, WeightedMinHashGenerator

    rng = np.random.RandomState(0)
    gen = WeightedMinHashGenerator(30, sample_size=64, seed=1)
    wms = [gen.minhash(rng.uniform(0, 3, 30)) for _ in range(4)]

    a = MinHashLSH(threshold=0.1, num_perm=64)
    for i, wm in enumerate(wms):
        a.insert("w%d" % i, wm)
    b = MinHashLSH(threshold=0.1, num_perm=64)
    b.insert_batch(["w%d" % i for i in range(4)], wms)
    # identical band keys -> identical query results (the 2-D hashvalues
    # stride bug made batch-inserted weighted entries unqueryable)
    for wm in wms:
        assert set(a.query(wm)) == set(b.query(wm))
    assert "w0" in b.query(wms[0])

    with pytest.raises(ValueError):
        b.insert_batch(["dup", "dup"], wms[:2])  # in-batch duplicate


class TestQueryBatch:
    def _minhashes(self, n=30, num_perm=128, seed=2):
        rng = np.random.RandomState(seed)
        ms = []
        for i in range(n):
            m = MinHash(num_perm=num_perm)
            m.update_batch(
                [b"t%d" % t for t in rng.choice(300, size=40, replace=False)]
            )
            ms.append(m)
        return ms

    def test_query_batch_equals_scalar(self):
        ms = self._minhashes()
        lsh = MinHashLSH(threshold=0.5, num_perm=128)
        for i, m in enumerate(ms):
            lsh.insert("k%d" % i, m)
        batch = lsh.query_batch(ms[:12])
        for i in range(12):
            assert sorted(batch[i]) == sorted(lsh.query(ms[i]))
        assert lsh.query_batch([]) == []

    def test_query_batch_weighted(self):
        from datasketch_tpu import WeightedMinHashGenerator

        gen = WeightedMinHashGenerator(50, sample_size=128)
        rng = np.random.RandomState(4)
        wms = [gen.minhash(rng.randint(1, 10, size=50)) for _ in range(10)]
        lsh = MinHashLSH(threshold=0.3, num_perm=128)
        for i, wm in enumerate(wms):
            lsh.insert(i, wm)
        batch = lsh.query_batch(wms)
        for i in range(10):
            assert sorted(map(str, batch[i])) == sorted(map(str, lsh.query(wms[i])))

    def test_query_batch_custom_hashfunc_fallback(self):
        from .utils import fake_hash_func

        ms = self._minhashes(n=8)
        lsh = MinHashLSH(threshold=0.5, num_perm=128, hashfunc=fake_hash_func)
        for i, m in enumerate(ms):
            lsh.insert(i, m)
        batch = lsh.query_batch(ms)
        for i in range(8):
            assert sorted(batch[i]) == sorted(lsh.query(ms[i]))

    def test_query_batch_wrong_num_perm(self):
        lsh = MinHashLSH(threshold=0.5, num_perm=128)
        with pytest.raises(ValueError):
            lsh.query_batch([MinHash(num_perm=64)])
