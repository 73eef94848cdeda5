"""Device b-bit MinHash: packing, SWAR match counts, TpuBBitIndex.

Parity targets: ``bBitMinHash`` masking and the Li & Koenig estimator
(``/root/reference/datasketch/b_bit_minhash.py:40-72``).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from datasketch_tpu import TpuBBitIndex, bBitMinHash
from datasketch_tpu.ops import bbit_ops

B_SWEEP = [1, 2, 3, 4, 5, 8, 12, 16, 32]


class _MH:
    """Minimal MinHash stand-in for bBitMinHash (hashvalues + seed)."""

    def __init__(self, hashvalues, seed=1):
        self.hashvalues = np.asarray(hashvalues, dtype=np.uint64)
        self.seed = seed


def _rand_sigs(rng, n, p):
    return rng.randint(0, 1 << 32, size=(n, p), dtype=np.uint64).astype(
        np.uint32
    )


@pytest.mark.parametrize("b", B_SWEEP)
def test_pack_device_matches_host(b):
    rng = np.random.RandomState(7 + b)
    sigs = _rand_sigs(rng, 9, 67)  # odd shapes exercise padding slots
    dev = np.asarray(bbit_ops.pack_bbit(jnp.asarray(sigs), b))
    host = bbit_ops.pack_bbit_host(sigs, b)
    np.testing.assert_array_equal(dev, host)


@pytest.mark.parametrize("b", B_SWEEP)
def test_pack_roundtrip_low_bits(b):
    rng = np.random.RandomState(11 + b)
    p = 50
    sigs = _rand_sigs(rng, 5, p)
    packed = bbit_ops.pack_bbit_host(sigs, b)
    s = bbit_ops.slot_size(b)
    spw = 32 // s
    # unpack on host and compare to the low-b-bit mask
    slots = (
        packed[:, :, None].astype(np.uint64)
        >> (np.arange(spw, dtype=np.uint64) * np.uint64(s))[None, None, :]
    ) & np.uint64((1 << s) - 1)
    got = slots.reshape(len(sigs), -1)[:, :p].astype(np.uint32)
    np.testing.assert_array_equal(got, sigs & np.uint32((1 << b) - 1))


@pytest.mark.parametrize("b", B_SWEEP)
def test_match_counts_vs_numpy(b):
    rng = np.random.RandomState(3 + b)
    p = 61
    db = _rand_sigs(rng, 23, p)
    q = _rand_sigs(rng, 6, p)
    # force some high-similarity pairs so counts aren't all near-zero
    q[0] = db[4]
    q[1, ::2] = db[7, ::2]
    mask = np.uint32((1 << b) - 1)
    want = ((q[:, None, :] & mask) == (db[None, :, :] & mask)).sum(axis=2)
    got = np.asarray(
        bbit_ops.match_counts(
            jnp.asarray(bbit_ops.pack_bbit_host(q, b)),
            jnp.asarray(bbit_ops.pack_bbit_host(db, b)),
            b,
            p,
        )
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("b", [1, 2, 4, 8, 16])
@pytest.mark.parametrize("r", [0.0, 0.3])
def test_estimator_matches_host_bbit(b, r):
    rng = np.random.RandomState(42)
    p = 128
    m1 = _MH(_rand_sigs(rng, 1, p)[0])
    hv2 = np.array(m1.hashvalues)
    flip = rng.rand(p) < 0.4
    hv2[flip] = _rand_sigs(rng, 1, p)[0][flip]
    m2 = _MH(hv2)
    want = bBitMinHash(m1, b=b, r=r).jaccard(bBitMinHash(m2, b=b, r=r))
    cnt = int(
        np.asarray(
            bbit_ops.match_counts(
                jnp.asarray(
                    bbit_ops.pack_bbit_host(
                        m1.hashvalues.astype(np.uint32)[None], b
                    )
                ),
                jnp.asarray(
                    bbit_ops.pack_bbit_host(
                        m2.hashvalues.astype(np.uint32)[None], b
                    )
                ),
                b,
                p,
            )
        )[0, 0]
    )
    c1, c2 = bbit_ops.estimator_constants(b, r, r)
    got = (cnt / p - c1) / (1 - c2)
    assert got == pytest.approx(want, abs=1e-12)


def _brute_topk(db, q, b, k):
    mask = np.uint32((1 << b) - 1)
    cnt = ((q[None, :] & mask) == (db & mask)).sum(axis=1)
    order = np.lexsort((np.arange(len(db)), -cnt))
    return list(order[:k])


@pytest.mark.parametrize("b", [1, 4, 16])
def test_index_topk_matches_bruteforce(b):
    rng = np.random.RandomState(5)
    p = 64
    n, nq, k = 300, 17, 5
    db = _rand_sigs(rng, n, p)
    queries = _rand_sigs(rng, nq, p)
    queries[0] = db[100]  # exact hit
    idx = TpuBBitIndex(b=b, num_perm=p)
    idx.insert_batch(list(range(n)), db)
    got = idx.query_batch(queries, k)
    for qi in range(nq):
        assert got[qi] == _brute_topk(db, queries[qi], b, k)


def test_index_scores_match_host_class():
    rng = np.random.RandomState(9)
    p, b = 128, 2
    db = _rand_sigs(rng, 40, p)
    q = _rand_sigs(rng, 3, p)
    idx = TpuBBitIndex(b=b, num_perm=p)
    idx.insert_batch([f"k{i}" for i in range(len(db))], db)
    res = idx.query_batch(q, 4, return_scores=True)
    for qi, row in enumerate(res):
        qm = _MH(q[qi].astype(np.uint64))
        for key, est in row:
            dm = _MH(db[int(key[1:])].astype(np.uint64))
            want = bBitMinHash(qm, b=b).jaccard(bBitMinHash(dm, b=b))
            assert est == pytest.approx(want, abs=1e-12)


def test_index_remove_compact_save_load(tmp_path):
    rng = np.random.RandomState(1)
    p = 64
    db = _rand_sigs(rng, 50, p)
    idx = TpuBBitIndex(b=4, num_perm=p)
    idx.insert_batch(list(range(50)), db)
    # removing the exact row must drop it from its own top-1
    assert idx.query(db[10], 1) == [10]
    idx.remove(10)
    assert idx.query(db[10], 1) != [10]
    assert 10 not in idx
    assert len(idx) == 49
    st = idx.status()
    assert st["n_removed"] == 1 and st["n_live"] == 49
    idx.compact()
    assert idx.status()["n_removed"] == 0
    path = str(tmp_path / "bbit_idx")
    idx.save(path)
    idx2 = TpuBBitIndex.load(path)
    assert len(idx2) == 49
    q = _rand_sigs(rng, 7, p)
    assert idx2.query_batch(q, 5) == idx.query_batch(q, 5)
    # incremental insert still works after load
    idx2.insert(999, db[10])
    assert idx2.query(db[10], 1) == [999]


def test_index_compression_factor():
    idx = TpuBBitIndex(b=1, num_perm=128)
    assert idx.width == 4  # 128 slots / 32 per word
    assert idx.status()["compression_x"] == 32.0
    idx8 = TpuBBitIndex(b=8, num_perm=128)
    assert idx8.width == 32 and idx8.status()["compression_x"] == 4.0


def test_index_errors_and_edges():
    idx = TpuBBitIndex(b=4, num_perm=32)
    assert idx.is_empty()
    assert idx.query_batch([np.zeros(32, dtype=np.uint32)], 3) == [[]]
    assert idx.query_batch(np.zeros((0, 32), dtype=np.uint32), 3) == []
    with pytest.raises(ValueError):
        TpuBBitIndex(b=0)
    with pytest.raises(ValueError):
        TpuBBitIndex(b=33)
    with pytest.raises(ValueError):
        TpuBBitIndex(r=1.5)
    idx.insert("a", np.arange(32, dtype=np.uint32))
    with pytest.raises(ValueError):
        idx.insert("a", np.arange(32, dtype=np.uint32))  # duplicate
    with pytest.raises(ValueError):
        idx.insert("b", np.arange(16, dtype=np.uint32))  # too short
    with pytest.raises(ValueError):
        idx.query(np.arange(32, dtype=np.uint32), 0)
    with pytest.raises(ValueError):
        idx.remove("nope")
    # duplicate inside one batch must not poison earlier keys
    with pytest.raises(ValueError):
        idx.insert_batch(["c", "c"], np.zeros((2, 32), dtype=np.uint32))
    assert "c" not in idx


def test_query_stream_matches_batch():
    rng = np.random.RandomState(3)
    p = 64
    db = _rand_sigs(rng, 90, p)
    idx = TpuBBitIndex(b=2, num_perm=p)
    idx.insert_batch(list(range(90)), db)
    batches = [_rand_sigs(rng, 8, p) for _ in range(3)]
    want = [idx.query_batch(bt, 4) for bt in batches]
    got = list(idx.query_stream(iter(batches), 4))
    assert got == want
