"""Live interop against the ACTUAL reference library.

The interop guarantee — sketches serialized by one library deserialize
in the other, bit-identically — is otherwise proven only by format
parity tests. Here both libraries are loaded side by side and exchange
real bytes. Skips cleanly if the reference checkout is absent.
"""

import sys

import numpy as np
import pytest

REFERENCE_PATH = "/root/reference"


@pytest.fixture(scope="module")
def ref():
    sys.path.insert(0, REFERENCE_PATH)
    try:
        import datasketch as reference
    except Exception:
        pytest.skip("reference library not importable")
    finally:
        sys.path.pop(0)
    return reference


TOKENS = [w.encode() for w in "the quick brown fox jumps over lazy dog".split()]


def test_minhash_bit_identical(ref):
    from datasketch_tpu import MinHash

    ours = MinHash(num_perm=64, seed=7)
    theirs = ref.MinHash(num_perm=64, seed=7)
    ours.update_batch(TOKENS)
    theirs.update_batch(TOKENS)
    np.testing.assert_array_equal(
        np.asarray(ours.hashvalues), np.asarray(theirs.hashvalues)
    )
    assert ours.jaccard(ours.copy()) == 1.0
    # cross-library jaccard via raw state
    cross = MinHash(num_perm=64, seed=7, hashvalues=theirs.hashvalues)
    assert ours.jaccard(cross) == 1.0


def test_lean_minhash_serialize_both_directions(ref):
    from datasketch_tpu import LeanMinHash, MinHash

    ours = MinHash(num_perm=32, seed=3)
    ours.update_batch(TOKENS)
    lean_ours = LeanMinHash(ours)

    # ours -> theirs
    buf = bytearray(lean_ours.bytesize())
    lean_ours.serialize(buf)
    lean_theirs = ref.LeanMinHash.deserialize(bytes(buf))
    assert lean_theirs.seed == 3
    np.testing.assert_array_equal(
        np.asarray(lean_theirs.hashvalues, dtype=np.uint64),
        np.asarray(lean_ours.hashvalues, dtype=np.uint64),
    )

    # theirs -> ours (and the big-endian variant)
    theirs = ref.MinHash(num_perm=32, seed=3)
    theirs.update_batch(TOKENS)
    lt = ref.LeanMinHash(theirs)
    for byteorder in ("@", ">", "<"):
        buf2 = bytearray(lt.bytesize(byteorder))
        lt.serialize(buf2, byteorder)
        back = LeanMinHash.deserialize(bytes(buf2), byteorder)
        np.testing.assert_array_equal(
            np.asarray(back.hashvalues, dtype=np.uint64),
            np.asarray(lean_ours.hashvalues, dtype=np.uint64),
        )


def test_hyperloglog_binary_both_directions(ref):
    from datasketch_tpu import HyperLogLog

    ours = HyperLogLog(p=8)
    for t in TOKENS * 3:
        ours.update(t)
    buf = bytearray(ours.bytesize())
    ours.serialize(buf)
    theirs = ref.HyperLogLog.deserialize(bytes(buf))
    np.testing.assert_array_equal(
        np.asarray(theirs.reg), np.asarray(ours.reg)
    )
    assert abs(theirs.count() - ours.count()) < 1e-9

    t2 = ref.HyperLogLog(p=8)
    for t in TOKENS:
        t2.update(t)
    buf2 = bytearray(t2.bytesize())
    t2.serialize(buf2)
    back = HyperLogLog.deserialize(bytes(buf2))
    np.testing.assert_array_equal(np.asarray(back.reg), np.asarray(t2.reg))


def test_lsh_same_candidates(ref):
    from datasketch_tpu import MinHash, MinHashLSH

    rng = np.random.RandomState(0)
    docs = [
        [bytes([int(b), i % 7]) for b in rng.randint(0, 200, size=30)]
        for i in range(40)
    ]
    ours_lsh = MinHashLSH(threshold=0.5, num_perm=64)
    theirs_lsh = ref.MinHashLSH(threshold=0.5, num_perm=64)
    assert (ours_lsh.b, ours_lsh.r) == (theirs_lsh.b, theirs_lsh.r)
    our_mhs = []
    for i, doc in enumerate(docs):
        om = MinHash(num_perm=64, seed=1)
        om.update_batch(doc)
        tm = ref.MinHash(num_perm=64, seed=1)
        tm.update_batch(doc)
        ours_lsh.insert(f"d{i}", om)
        theirs_lsh.insert(f"d{i}", tm)
        our_mhs.append(om)
    for i in range(0, 40, 5):
        assert set(ours_lsh.query(our_mhs[i])) == set(
            theirs_lsh.query(our_mhs[i])
        )


def test_weighted_minhash_bit_identical(ref):
    from datasketch_tpu import WeightedMinHashGenerator

    v = np.zeros(50)
    v[[1, 7, 20, 33, 49]] = [2.0, 1.0, 5.0, 0.5, 3.0]
    ours = WeightedMinHashGenerator(50, sample_size=32, seed=9).minhash(v)
    theirs = ref.WeightedMinHashGenerator(50, sample_size=32, seed=9).minhash(v)
    np.testing.assert_array_equal(
        np.asarray(ours.hashvalues), np.asarray(theirs.hashvalues)
    )
