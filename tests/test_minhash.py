"""MinHash / LeanMinHash tests.

Coverage model: /root/reference/test/test_minhash.py and
test/test_lean_minhash.py — identity-hash determinism, golden SHA1 values,
jaccard/merge/union semantics, serialization round-trips — plus parity tests
that the device batch path is bit-identical to the host formula.
"""

import pickle
import struct

import numpy as np
import pytest

from datasketch_tpu import MinHash, LeanMinHash
from datasketch_tpu.hashfunc import sha1_hash32
from datasketch_tpu.ops import minhash_ops

from .utils import fake_hash_func


class TestMinHash:
    def test_init(self):
        m1 = MinHash(4, 1, hashfunc=fake_hash_func)
        m2 = MinHash(4, 1, hashfunc=fake_hash_func)
        assert m1.is_empty()
        np.testing.assert_array_equal(m1.permutations[0], m2.permutations[0])
        np.testing.assert_array_equal(m1.permutations[1], m2.permutations[1])

    def test_golden_sha1_hashvalues(self):
        """Golden values from /root/reference/test/test_minhash.py:109-115 —
        proves cross-library signature compatibility."""
        m = MinHash(4, 1, hashfunc=sha1_hash32)
        m.update(b"Hello")
        expected = np.array(
            [734825475, 960773806, 359816889, 342714745], dtype=np.uint64
        )
        np.testing.assert_array_equal(m.hashvalues, expected)

    def test_update_matches_reference_formula(self):
        m = MinHash(128, 1, hashfunc=fake_hash_func)
        for v in [1, 100, 10000, 2**32 - 1]:
            m.update(v)
        a, b = m.permutations
        p = np.uint64((1 << 61) - 1)
        mx = np.uint64((1 << 32) - 1)
        expect = np.full(128, mx, dtype=np.uint64)
        for v in [1, 100, 10000, 2**32 - 1]:
            phv = np.bitwise_and((a * np.uint64(v) + b) % p, mx)
            expect = np.minimum(expect, phv)
        np.testing.assert_array_equal(m.hashvalues, expect)

    def test_update_batch_equals_updates(self):
        vals = list(np.random.RandomState(0).randint(0, 2**32, size=100))
        m1 = MinHash(64, 1, hashfunc=fake_hash_func)
        m2 = MinHash(64, 1, hashfunc=fake_hash_func)
        for v in vals:
            m1.update(int(v))
        m2.update_batch([int(v) for v in vals])
        np.testing.assert_array_equal(m1.hashvalues, m2.hashvalues)

    def test_device_batch_parity(self):
        """The jitted limb kernel must match the NumPy uint64 formula."""
        rng = np.random.RandomState(3)
        hashes = [
            rng.randint(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
            for n in (5, 117, 1, 250)
        ]
        padded, lengths = minhash_ops.pad_token_hashes(hashes)
        sigs = np.asarray(minhash_ops.compute_signatures(padded, lengths, 1, 128))
        a, b = minhash_ops.init_permutations(1, 128)
        p = np.uint64((1 << 61) - 1)
        mx = np.uint64((1 << 32) - 1)
        for i, hv in enumerate(hashes):
            phv = np.bitwise_and(
                (hv.astype(np.uint64)[:, None] * a + b) % p, mx
            )
            np.testing.assert_array_equal(
                sigs[i].astype(np.uint64), phv.min(axis=0), err_msg=f"doc {i}"
            )

    def test_jaccard(self):
        m1 = MinHash(4, 1, hashfunc=fake_hash_func)
        m2 = MinHash(4, 1, hashfunc=fake_hash_func)
        assert m1.jaccard(m2) == 1.0
        m2.update(12)
        assert m1.jaccard(m2) == 0.0
        m1.update(13)
        assert m1.jaccard(m2) < 1.0

    def test_jaccard_errors(self):
        m1 = MinHash(4, 1)
        m2 = MinHash(4, 2)
        with pytest.raises(ValueError):
            m1.jaccard(m2)
        m3 = MinHash(8, 1)
        with pytest.raises(ValueError):
            m1.jaccard(m3)

    def test_merge_union(self):
        m1 = MinHash(4, 1, hashfunc=fake_hash_func)
        m2 = MinHash(4, 1, hashfunc=fake_hash_func)
        m1.update(11)
        m2.update(12)
        u = MinHash.union(m1, m2)
        m1.merge(m2)
        assert u.jaccard(m1) == 1.0
        with pytest.raises(ValueError):
            MinHash.union(m1)

    def test_count(self):
        m = MinHash(512, 1, hashfunc=fake_hash_func)
        for i in range(100):
            m.update(i * 2654435761 % 2**32)
        est = m.count()
        assert 60 < est < 140

    def test_bulk_and_generator(self):
        data = [[b"token-%d-%d" % (i, j) for j in range(50)] for i in range(20)]
        ms_bulk = MinHash.bulk(data, num_perm=64)
        ms_seq = []
        for doc in data:
            m = MinHash(num_perm=64)
            m.update_batch(doc)
            ms_seq.append(m)
        assert len(ms_bulk) == 20
        for mb, ms in zip(ms_bulk, ms_seq):
            np.testing.assert_array_equal(mb.hashvalues, ms.hashvalues)
        ms_gen = list(MinHash.generator(data, num_perm=64))
        for mg, ms in zip(ms_gen, ms_seq):
            np.testing.assert_array_equal(mg.hashvalues, ms.hashvalues)

    def test_pickle(self):
        m = MinHash(4, 1, hashfunc=sha1_hash32)
        m.update(b"a")
        m.update(b"b")
        m2 = pickle.loads(pickle.dumps(m))
        assert m == m2

    def test_eq_copy_clear(self):
        m1 = MinHash(4, 1, hashfunc=fake_hash_func)
        m1.update(11)
        m2 = m1.copy()
        assert m1 == m2
        m2.update(12)
        assert m1 != m2
        m2.clear()
        assert m2.is_empty()


class TestLeanMinHash:
    def _make(self):
        m = MinHash(64, 1, hashfunc=sha1_hash32)
        m.update_batch([b"a", b"b", b"c"])
        return LeanMinHash(m)

    def test_init_and_jaccard(self):
        m = MinHash(64, 1)
        m.update(b"x")
        lm = LeanMinHash(m)
        assert lm.jaccard(m) == 1.0
        assert lm.count() == m.count()
        with pytest.raises(TypeError):
            lm.update(b"y")
        with pytest.raises(ValueError):
            LeanMinHash()

    def test_serialize_roundtrip(self):
        lm = self._make()
        for byteorder in ("@", "<", ">", "=", "!"):
            buf = bytearray(lm.bytesize(byteorder))
            lm.serialize(buf, byteorder)
            lm2 = LeanMinHash.deserialize(buf, byteorder)
            assert lm == lm2
            assert lm2.seed == lm.seed

    def test_serialize_format(self):
        """Byte layout parity: seed q, count i, values I
        (/root/reference/datasketch/lean_minhash.py:174-175)."""
        lm = self._make()
        buf = bytearray(lm.bytesize("<"))
        lm.serialize(buf, "<")
        seed, n = struct.unpack_from("<qi", buf, 0)
        assert seed == 1 and n == 64
        vals = struct.unpack_from("<64I", buf, struct.calcsize("<qi"))
        np.testing.assert_array_equal(np.array(vals, dtype=np.uint64), lm.hashvalues)

    def test_buffer_too_small(self):
        lm = self._make()
        with pytest.raises(ValueError):
            lm.serialize(bytearray(4))

    def test_pickle_and_hash(self):
        lm = self._make()
        lm2 = pickle.loads(pickle.dumps(lm))
        assert lm == lm2
        assert hash(lm) == hash(lm2)

    def test_union(self):
        m1 = MinHash(16, 1)
        m2 = MinHash(16, 1)
        m1.update(b"a")
        m2.update(b"b")
        lu = LeanMinHash.union(LeanMinHash(m1), LeanMinHash(m2))
        mu = MinHash.union(m1, m2)
        np.testing.assert_array_equal(lu.hashvalues, mu.hashvalues)
        with pytest.raises(ValueError):
            LeanMinHash.union(LeanMinHash(m1))


def test_profiling_utils():
    import numpy as np
    import jax.numpy as jnp

    from datasketch_tpu.utils import device_sync, time_op

    def op(x):
        return x * 2, x > 0

    best, out = time_op(op, jnp.arange(16), warmup=1, iters=2)
    assert best >= 0 and np.asarray(out[0])[1] == 2
    device_sync(out)  # idempotent


def test_bulk_signatures_matrix():
    import numpy as np

    from datasketch_tpu import MinHash

    docs = [[b"t%d" % (i * 5 + j) for j in range(20 + i)] for i in range(9)]
    sigs = MinHash.bulk_signatures(docs, num_perm=128)
    assert sigs.shape == (9, 128) and sigs.dtype == np.uint32
    objs = MinHash.bulk(docs, num_perm=128)
    for row, m in zip(sigs, objs):
        assert np.array_equal(row.astype(np.uint64), np.asarray(m.hashvalues))
    # oph scheme + empty corpus
    s2 = MinHash.bulk_signatures(docs, num_perm=128, scheme="oph")
    assert s2.shape == (9, 128)
    assert MinHash.bulk_signatures([], num_perm=64).shape == (0, 64)


def test_bulk_signatures_custom_permutations_and_disable():
    import numpy as np

    from datasketch_tpu import MinHash
    from datasketch_tpu.ops.minhash_ops import init_permutations

    docs = [[b"a%d" % j for j in range(i + 5)] for i in range(4)]
    perms = init_permutations(999, 32)
    want = []
    for d in docs:
        m = MinHash(num_perm=32, seed=1, permutations=perms)
        m.update_batch(d)
        want.append(np.asarray(m.hashvalues, dtype=np.uint64).astype(np.uint32))
    got = MinHash.bulk_signatures(docs, num_perm=32, seed=1, permutations=perms)
    np.testing.assert_array_equal(got, np.stack(want))

    got2 = MinHash.bulk_signatures(docs, num_perm=32, seed=1,
                                   permutations=perms, device_mode="disable")
    np.testing.assert_array_equal(got2, np.stack(want))


def test_tpu_lsh_index_in_batch_duplicates():
    import numpy as np
    import pytest

    from datasketch_tpu import TpuMinHashLSH

    sigs = np.random.RandomState(0).randint(
        0, 1 << 32, size=(3, 128), dtype=np.uint64
    ).astype(np.uint32)
    idx = TpuMinHashLSH(threshold=0.5, num_perm=128)
    with pytest.raises(ValueError):
        idx.index(["a", "a", "b"], sigs)
