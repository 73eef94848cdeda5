"""bBitMinHash tests: estimator behavior, vectorized pack/unpack round-trip
across all slot sizes (coverage model: /root/reference/test/test_minhash.py
b-bit sections)."""

import pickle

import numpy as np
import pytest

from datasketch_tpu import MinHash, bBitMinHash

from .utils import fake_hash_func


def _pair(overlap=80, n=100, num_perm=256):
    rng = np.random.RandomState(5)
    base = [int(x) for x in rng.randint(0, 2**31, n)]
    other = base[:overlap] + [int(x) for x in rng.randint(0, 2**31, n - overlap)]
    m1 = MinHash(num_perm, hashfunc=fake_hash_func)
    m2 = MinHash(num_perm, hashfunc=fake_hash_func)
    m1.update_batch(base)
    m2.update_batch(other)
    return m1, m2


class TestBBitMinHash:
    def test_init_validation(self):
        m, _ = _pair()
        with pytest.raises(ValueError):
            bBitMinHash(m, b=33)
        with pytest.raises(ValueError):
            bBitMinHash(m, b=-1)
        with pytest.raises(ValueError):
            bBitMinHash(m, r=1.5)

    def test_low_bits_kept(self):
        m, _ = _pair()
        bm = bBitMinHash(m, b=4)
        np.testing.assert_array_equal(
            bm.hashvalues, (m.hashvalues & np.uint64(0xF)).astype(np.uint32)
        )

    def test_jaccard_tracks_full(self):
        m1, m2 = _pair()
        full = m1.jaccard(m2)
        for b in (32, 16, 8):
            est = bBitMinHash(m1, b=b).jaccard(bBitMinHash(m2, b=b))
            assert abs(est - full) < 0.1, f"b={b}"

    def test_jaccard_errors(self):
        m1, m2 = _pair()
        with pytest.raises(ValueError):
            bBitMinHash(m1, b=2).jaccard(bBitMinHash(m2, b=4))
        m3 = MinHash(256, seed=9, hashfunc=fake_hash_func)
        with pytest.raises(ValueError):
            bBitMinHash(m1, b=2).jaccard(bBitMinHash(m3, b=2))

    @pytest.mark.parametrize("b", [1, 2, 3, 4, 5, 8, 12, 16, 27, 32])
    @pytest.mark.parametrize("num_perm", [128, 100])
    def test_pickle_roundtrip_all_slot_sizes(self, b, num_perm):
        rng = np.random.RandomState(b)
        m = MinHash(num_perm, hashfunc=fake_hash_func)
        m.update_batch([int(x) for x in rng.randint(0, 2**31, 50)])
        bm = bBitMinHash(m, b=b, r=0.3)
        bm2 = pickle.loads(pickle.dumps(bm))
        assert bm == bm2
        assert bm2.bytesize() == bm.bytesize()

    def test_reference_wire_format(self):
        """Header layout <qBdi then uint64 blocks, slots packed MSB-first."""
        import struct

        m, _ = _pair(num_perm=8)
        bm = bBitMinHash(m, b=1)
        buf = bm.__getstate__()
        seed, b, r, num_perm = struct.unpack_from("<qBdi", bytes(buf), 0)
        assert (seed, b, num_perm) == (bm.seed, 1, 8)
        (block,) = struct.unpack_from(
            "Q", bytes(buf), struct.calcsize("<qBdi")
        )
        expect = 0
        for j, hv in enumerate(bm.hashvalues):
            expect |= int(hv) << (64 - 1 - j) * 1
        assert block == expect
