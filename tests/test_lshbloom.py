"""MinHashLSHBloom tests (model: /root/reference/test/test_lshbloom.py —
band insert/query, file persistence round-trip, in-memory warning)."""

import warnings

import numpy as np
import pytest

from datasketch_tpu import MinHash, MinHashLSHBloom
from datasketch_tpu.models.lsh_bloom import BloomTable

from .utils import fake_hash_func


def _mh(values, num_perm=128):
    m = MinHash(num_perm, hashfunc=fake_hash_func)
    m.update_batch(values)
    return m


class TestBloomTable:
    def test_insert_query(self):
        t = BloomTable(item_count=1000, fp=0.001, band_size=4)
        hv = np.array([1, 2, 3, 4], dtype=np.uint64)
        assert not t.query(hv)
        t.insert(hv)
        assert t.query(hv)
        assert not t.query(np.array([5, 6, 7, 8], dtype=np.uint64))

    def test_band_size_check(self):
        t = BloomTable(item_count=10, fp=0.01, band_size=4)
        with pytest.raises(RuntimeError):
            t.insert(np.array([1, 2, 3], dtype=np.uint64))

    def test_fp_rate_roughly_holds(self):
        t = BloomTable(item_count=2000, fp=0.01, band_size=1)
        rng = np.random.RandomState(0)
        keys = rng.randint(0, 2**60, size=2000).astype(np.uint64)
        t.insert_keys(keys)
        probe = rng.randint(2**60, 2**61, size=5000).astype(np.uint64)
        fp_rate = t.query_keys(probe).mean()
        assert fp_rate < 0.03

    def test_persistence_roundtrip(self, tmp_path):
        fname = str(tmp_path / "band-0.bf")
        t = BloomTable(item_count=100, fp=0.01, band_size=2, fname=fname)
        hv = np.array([11, 22], dtype=np.uint64)
        t.insert(hv)
        t.sync()
        t2 = BloomTable(item_count=100, fp=0.01, band_size=2, fname=fname)
        assert t2.query(hv)
        assert t2.num_bits == t.num_bits and t2.num_hashes == t.num_hashes

    def test_inmemory_sync_warns(self):
        t = BloomTable(item_count=10, fp=0.01, band_size=2)
        with pytest.warns(RuntimeWarning):
            t.sync()


class TestMinHashLSHBloom:
    def _make(self, **kw):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            return MinHashLSHBloom(
                threshold=kw.pop("threshold", 0.5),
                num_perm=kw.pop("num_perm", 128),
                n=kw.pop("n", 1000),
                fp=kw.pop("fp", 0.001),
                **kw,
            )

    def test_validation(self):
        with pytest.raises(ValueError):
            self._make(n=None)
        with pytest.raises(ValueError):
            self._make(fp=2.0)
        with pytest.raises(ValueError):
            self._make(threshold=3.0)
        with pytest.raises(ValueError):
            self._make(params=(64, 8))

    def test_inmemory_warns(self):
        with pytest.warns(RuntimeWarning):
            MinHashLSHBloom(threshold=0.5, num_perm=16, n=10, fp=0.01)

    def test_duplicate_detection(self):
        lsh = self._make()
        rng = np.random.RandomState(7)
        base = [int(x) for x in rng.randint(0, 2**31, 100)]
        lsh.insert(_mh(base))
        # near-duplicate (90% overlap) should collide
        near = base[:90] + [int(x) for x in rng.randint(0, 2**31, 10)]
        assert lsh.query(_mh(near))
        # unrelated doc should not
        other = [int(x) for x in rng.randint(2**31, 2**32, 100)]
        assert not lsh.query(_mh(other))

    def test_batch_paths_match_single(self):
        lsh1 = self._make()
        lsh2 = self._make()
        rng = np.random.RandomState(8)
        ms = []
        for i in range(30):
            ms.append(_mh([int(x) for x in rng.randint(0, 2**31, 50)]))
        for m in ms:
            lsh1.insert(m)
        lsh2.insert_batch(ms)
        probes = ms[:10] + [
            _mh([int(x) for x in rng.randint(0, 2**31, 50)]) for _ in range(10)
        ]
        single1 = [lsh1.query(m) for m in probes]
        single2 = [lsh2.query(m) for m in probes]
        batch2 = list(lsh2.query_batch(probes))
        assert single1 == single2 == batch2
        assert all(single1[:10])  # inserted ones always found

    def test_persistence(self, tmp_path):
        d = str(tmp_path / "idx")
        lsh = MinHashLSHBloom(
            threshold=0.5, num_perm=64, n=100, fp=0.001, save_dir=d
        )
        m = _mh(range(100), 64)
        lsh.insert(m)
        lsh.sync()
        lsh2 = MinHashLSHBloom(
            threshold=0.5, num_perm=64, n=100, fp=0.001, save_dir=d
        )
        assert lsh2.query(m)


def test_tpu_bloom_matches_host_semantics():
    import numpy as np

    from datasketch_tpu import MinHash
    from datasketch_tpu.models.lsh_bloom import MinHashLSHBloom, TpuMinHashLSHBloom

    rng = np.random.RandomState(0)

    def mh(tokens):
        m = MinHash(num_perm=128)
        m.update_batch([t.encode() for t in tokens])
        return m

    docs = [["t%d" % (i * 3 + j) for j in range(30)] for i in range(20)]
    mhs = [mh(d) for d in docs]
    fresh = [mh(["x%d" % (i + 999)] * 5 + ["y%d" % i for i in range(25)])
             for i in range(5)]

    host = MinHashLSHBloom(threshold=0.5, num_perm=128, n=1000, fp=0.01)
    tpu = TpuMinHashLSHBloom(threshold=0.5, num_perm=128, n=1000, fp=0.01)
    host.insert_batch(mhs)
    tpu.insert_batch(mhs)
    assert all(tpu.query_batch(mhs))        # all indexed found
    assert all(host.query(m) for m in mhs)
    # unseen docs: overwhelmingly negative on both
    assert tpu.query_batch(fresh).sum() <= 1
    assert tpu.query(mhs[0]) is True and tpu.query(fresh[0]) in (False, True)


def test_tpu_bloom_persistence(tmp_path):
    import numpy as np

    from datasketch_tpu import MinHash
    from datasketch_tpu.models.lsh_bloom import TpuMinHashLSHBloom

    def mh(tokens):
        m = MinHash(num_perm=128)
        m.update_batch([t.encode() for t in tokens])
        return m

    mhs = [mh(["p%d" % (i * 7 + j) for j in range(20)]) for i in range(10)]
    bloom = TpuMinHashLSHBloom(threshold=0.5, num_perm=128, n=500, fp=0.01)
    bloom.insert_batch(mhs)
    path = str(tmp_path / "bloom")
    bloom.save(path)
    restored = TpuMinHashLSHBloom.load(path)
    assert restored.b == bloom.b and restored.num_bits == bloom.num_bits
    assert all(restored.query_batch(mhs))
    fresh = mh(["unseen%d" % i for i in range(20)])
    assert bool(restored.query(fresh)) == bool(bloom.query(fresh))
