"""On-device k-shingle hashing from raw text (ops/text_ops.py).

The device path uploads 1 byte/char and hashes windows on-chip — the
bandwidth-optimal text front end (BASELINE.md round-3: end-to-end rates
are bound by ~50MB/s tunnel H2D, so bytes/doc is the lever). These tests
pin bit-parity between the device kernel and its host twin, the
empty/short-text edge semantics, agreement of the bulk API with the ops
layer, and the statistical acceptance bound vs TRUE shingle Jaccard.
"""

from __future__ import annotations

import numpy as np
import pytest

from datasketch_tpu import MinHash
from datasketch_tpu.ops import text_ops


def _random_text(rng, n):
    return bytes(rng.randint(32, 127, size=n, dtype=np.uint8))


def test_window_hashes_np_basics():
    wh = text_ops.window_hashes_np(b"abcdefghij", 9)
    assert wh.shape == (2,) and wh.dtype == np.uint32
    assert wh[0] != wh[1]
    # deterministic, position-independent: same window -> same hash
    wh2 = text_ops.window_hashes_np(b"XXabcdefghi", 9)
    assert wh2[2] == wh[0]
    assert text_ops.window_hashes_np(b"short", 9).shape == (0,)


def test_device_matches_host_twin():
    rng = np.random.RandomState(31)
    texts = [_random_text(rng, n) for n in (9, 10, 57, 300, 1000)]
    k = 9
    lengths = np.array([len(t) for t in texts], np.int32)
    flat = np.frombuffer(b"".join(texts), dtype=np.uint8)
    sigs = text_ops.shingle_signatures_ragged(flat, lengths, k, 1, 64)
    from datasketch_tpu.ops import minhash_ops

    for i, t in enumerate(texts):
        wh = text_ops.window_hashes_np(t, k)
        want = minhash_ops.compute_signatures(
            wh[None, :], np.array([len(wh)], np.int32), 1, 64
        )
        np.testing.assert_array_equal(
            np.asarray(sigs[i]), np.asarray(want[0]), err_msg=f"text {i}"
        )


def test_short_and_empty_texts_yield_empty_sketch():
    rng = np.random.RandomState(32)
    texts = [b"", b"abc", _random_text(rng, 100)]
    lengths = np.array([len(t) for t in texts], np.int32)
    flat = np.frombuffer(b"".join(texts), dtype=np.uint8)
    sigs = np.asarray(
        text_ops.shingle_signatures_ragged(flat, lengths, 9, 1, 32)
    )
    assert (sigs[0] == 0xFFFFFFFF).all()
    assert (sigs[1] == 0xFFFFFFFF).all()
    assert not (sigs[2] == 0xFFFFFFFF).all()


def test_bulk_from_text_device_matches_ops_layer():
    import jax

    rng = np.random.RandomState(33)
    texts = [_random_text(rng, n) for n in rng.randint(5, 400, size=30)]
    host = MinHash.bulk_from_text(texts, k=9, hashfunc="device", seed=3,
                                  num_perm=64)
    lengths = np.array([len(t) for t in texts], np.int32)
    flat = np.frombuffer(b"".join(texts), dtype=np.uint8)
    want = np.asarray(
        text_ops.shingle_signatures_ragged(flat, lengths, 9, 3, 64)
    )
    np.testing.assert_array_equal(host, want)
    dev = MinHash.bulk_from_text(texts, k=9, hashfunc="device", seed=3,
                                 num_perm=64, out="device")
    assert isinstance(dev, jax.Array)
    np.testing.assert_array_equal(host, np.asarray(dev))
    # str inputs are utf-8 encoded like the native path
    s = MinHash.bulk_from_text(["hello world galaxy"], k=5,
                               hashfunc="device", num_perm=32)
    s2 = MinHash.bulk_from_text([b"hello world galaxy"], k=5,
                                hashfunc="device", num_perm=32)
    np.testing.assert_array_equal(s, s2)


def test_bulk_from_text_device_rejects_alt_schemes():
    with pytest.raises(ValueError, match="permutation"):
        MinHash.bulk_from_text([b"abcdefghij"], hashfunc="device",
                               scheme="oph")
    with pytest.raises(ValueError, match="out must be"):
        MinHash.bulk_from_text([b"abcdefghij"], hashfunc="device",
                               out="both")


def test_jaccard_tracks_true_shingle_jaccard():
    """Statistical acceptance: device-shingle signature Jaccard estimates
    the TRUE k-shingle-set Jaccard within the 1/sqrt(P) MinHash bound —
    i.e. the polynomial+fmix32 window hash behaves like a random hash."""
    rng = np.random.RandomState(34)
    k, num_perm = 9, 256
    errs = []
    for _ in range(20):
        n = 600
        a = bytearray(_random_text(rng, n))
        b = bytearray(a)
        # mutate a random suffix region to dial similarity
        cut = rng.randint(50, 550)
        b[cut:] = _random_text(rng, n - cut)
        a, b = bytes(a), bytes(b)
        sa = set(a[i:i + k] for i in range(len(a) - k + 1))
        sb = set(b[i:i + k] for i in range(len(b) - k + 1))
        true_j = len(sa & sb) / len(sa | sb)
        sigs = MinHash.bulk_from_text([a, b], k=k, hashfunc="device",
                                      num_perm=num_perm)
        est = float((sigs[0] == sigs[1]).mean())
        errs.append(abs(est - true_j))
    assert float(np.mean(errs)) < 1.0 / np.sqrt(num_perm)


def test_empty_corpus():
    out = MinHash.bulk_from_text([], hashfunc="device", num_perm=16)
    assert out.shape == (0, 16)


def test_index_text_end_to_end():
    from datasketch_tpu import TpuMinHashLSH

    rng = np.random.RandomState(35)
    texts = [_random_text(rng, 400) for _ in range(40)]
    # near-duplicates of the first 8: keep a 360-char prefix
    dups = [t[:360] + _random_text(rng, 40) for t in texts[:8]]
    index = TpuMinHashLSH(threshold=0.5, num_perm=128, bucket_cap=64)
    index.index_text(list(range(40)), texts, k=9, seed=2)
    qsigs = MinHash.bulk_from_text(dups, k=9, hashfunc="device", seed=2,
                                   num_perm=128)
    hits = index.query_batch(
        [MinHash(hashvalues=row, hashfunc="device") for row in qsigs]
    )
    found = sum(1 for i, row in enumerate(hits) if i in row)
    assert found >= 7
    with pytest.raises(ValueError, match="equal length"):
        index.index_text([1], texts[:2])


def test_query_side_token_and_text_conveniences():
    """query_tokens/top_k_tokens/query_text/top_k_text: symmetric
    query-side twins of the index_* front ends — no per-query sketch
    objects, everything hashed on-chip."""
    from datasketch_tpu import TpuMinHashLSH

    rng = np.random.RandomState(38)
    texts = [_random_text(rng, 300) for _ in range(30)]
    index = TpuMinHashLSH(threshold=0.5, num_perm=128, bucket_cap=64)
    index.index_text(list(range(30)), texts, k=9, seed=2)
    rows = index.query_text(texts[:5], shingle_k=9, seed=2)
    assert all(i in row for i, row in enumerate(rows))
    top = index.top_k_text(texts[:5], k=3, shingle_k=9, seed=2)
    assert all(row and row[0][0] == i for i, row in enumerate(top))

    docs = [rng.choice(5000, size=120, replace=False).astype(np.uint32)
            for _ in range(30)]
    tindex = TpuMinHashLSH(threshold=0.5, num_perm=128, bucket_cap=64)
    tindex.index_tokens(list(range(30)), docs, seed=1)
    rows = tindex.query_tokens(docs[:5], seed=1, return_scores=True)
    assert all(any(kk == i and s > 0.99 for kk, s in row)
               for i, row in enumerate(rows))
    top = tindex.top_k_tokens(docs[:5], k=3, seed=1)
    assert all(row and row[0][0] == i for i, row in enumerate(top))


def test_sharded_query_side_conveniences():
    import jax
    from jax.sharding import Mesh

    from datasketch_tpu.parallel import ShardedMinHashLSH

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("data",))
    rng = np.random.RandomState(39)
    texts = [_random_text(rng, 300) for _ in range(24)]
    index = ShardedMinHashLSH(mesh, threshold=0.5, num_perm=128,
                              bucket_cap=64)
    index.index_text(list(range(24)), texts, k=9, seed=2)
    rows = index.query_text(texts[:4], shingle_k=9, seed=2)
    assert all(i in row for i, row in enumerate(rows))
    top = index.top_k_text(texts[:4], k=3, shingle_k=9, seed=2)
    assert all(row and row[0][0] == i for i, row in enumerate(top))
    docs = [rng.choice(5000, size=120, replace=False).astype(np.uint32)
            for _ in range(24)]
    tix = ShardedMinHashLSH(mesh, threshold=0.5, num_perm=128,
                            bucket_cap=64)
    tix.index_tokens(list(range(24)), docs, seed=1)
    assert all(i in row for i, row in
               enumerate(tix.query_tokens(docs[:4], seed=1)))
    top = tix.top_k_tokens(docs[:4], k=3, seed=1)
    assert all(row and row[0][0] == i for i, row in enumerate(top))


def test_front_ends_on_other_device_indexes():
    """index_tokens/index_text (forest), insert_tokens/insert_text (b-bit,
    bloom): every device index builds straight from ids or raw text with
    the same contract as TpuMinHashLSH."""
    from datasketch_tpu import (
        TpuBBitIndex,
        TpuMinHashLSHBloom,
        TpuMinHashLSHForest,
    )

    rng = np.random.RandomState(37)
    texts = [_random_text(rng, 300) for _ in range(24)]
    dups = [t[:270] + _random_text(rng, 30) for t in texts[:4]]
    qsigs = MinHash.bulk_from_text(dups, k=9, hashfunc="device", seed=2,
                                   num_perm=128)
    qmhs = [MinHash(hashvalues=row, hashfunc="device") for row in qsigs]

    forest = TpuMinHashLSHForest(num_perm=128, l=8, cap=16)
    forest.index_text(list(range(24)), texts, k=9, seed=2)
    rows = forest.query_batch(qsigs, k=3)
    assert sum(1 for i, row in enumerate(rows) if i in row) >= 3
    with pytest.raises(ValueError, match="equal length"):
        forest.index_tokens([1], [np.array([1, 2], np.uint32)] * 2)

    bbit = TpuBBitIndex(b=8, num_perm=128)
    bbit.insert_text(list(range(24)), texts, k=9, seed=2)
    rows = bbit.query_batch(qsigs, 3)
    assert sum(1 for i, row in enumerate(rows) if i in row) >= 3

    bloom = TpuMinHashLSHBloom(threshold=0.5, num_perm=128, n=1000)
    bloom.insert_text(texts, k=9, seed=2)
    assert bloom.query_batch(qmhs).sum() >= 3

    # token front ends on the same classes
    docs = [rng.choice(5000, size=120, replace=False).astype(np.uint32)
            for _ in range(20)]
    tok_sigs = MinHash.bulk_signatures(docs[:3], num_perm=128, seed=1,
                                       hashfunc="device")
    forest2 = TpuMinHashLSHForest(num_perm=128, l=8, cap=16)
    forest2.index_tokens(list(range(20)), docs, seed=1)
    rows = forest2.query_batch(tok_sigs, k=3)
    assert all(i in row for i, row in enumerate(rows))
    bbit2 = TpuBBitIndex(b=8, num_perm=128)
    bbit2.insert_tokens(list(range(20)), docs, seed=1)
    rows = bbit2.query_batch(tok_sigs, 3)
    assert all(i in row for i, row in enumerate(rows))
    bloom2 = TpuMinHashLSHBloom(threshold=0.5, num_perm=128, n=1000)
    bloom2.insert_tokens(docs, seed=1)
    assert bloom2.query_batch(
        [MinHash(hashvalues=r, hashfunc="device") for r in tok_sigs]
    ).all()


def test_sharded_forest_hnsw_front_ends():
    import jax
    from jax.sharding import Mesh

    from datasketch_tpu.parallel import ShardedHNSW, ShardedMinHashLSHForest

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("data",))
    rng = np.random.RandomState(43)
    texts = [_random_text(rng, 300) for _ in range(24)]
    qsigs = MinHash.bulk_from_text(texts[:4], k=9, hashfunc="device",
                                   seed=2, num_perm=128)
    forest = ShardedMinHashLSHForest(mesh, num_perm=128, l=8, cap=16)
    forest.index_text(list(range(24)), texts, k=9, seed=2)
    rows = forest.query_batch(qsigs, k=3)
    assert sum(1 for i, row in enumerate(rows) if i in row) >= 3

    ann = ShardedHNSW(mesh, "minhash_jaccard", m=4, ef=16)
    ann.index_text(list(range(24)), texts, k=9, seed=2)
    rows = ann.query_batch(qsigs.astype(np.float32), k=3)
    assert all(row and row[0][0] == i for i, row in enumerate(rows))
    with pytest.raises(ValueError, match="minhash_jaccard"):
        ShardedHNSW(mesh, "l2").index_tokens([0], [[1, 2, 3]])

    docs = [rng.choice(5000, size=100, replace=False).astype(np.uint32)
            for _ in range(20)]
    tsigs = MinHash.bulk_signatures(docs[:3], num_perm=128, seed=1,
                                    hashfunc="device")
    forest2 = ShardedMinHashLSHForest(mesh, num_perm=128, l=8, cap=16)
    forest2.index_tokens(list(range(20)), docs, seed=1)
    rows = forest2.query_batch(tsigs, k=3)
    assert all(i in row for i, row in enumerate(rows))

    # inherited front ends route through the SHARDED build paths
    from datasketch_tpu.parallel import (
        ShardedBBitIndex,
        ShardedMinHashLSHBloom,
    )

    bbit = ShardedBBitIndex(mesh, b=8, num_perm=128)
    bbit.insert_tokens(list(range(20)), docs, seed=1)
    rows = bbit.query_batch(tsigs, 3)
    assert all(i in row for i, row in enumerate(rows))
    bloom = ShardedMinHashLSHBloom(mesh, threshold=0.5, num_perm=128,
                                   n=1000)
    bloom.insert_tokens(docs, seed=1)
    assert bloom.query_batch(
        [MinHash(hashvalues=r, hashfunc="device") for r in tsigs]
    ).all()


def test_hnsw_and_ensemble_front_ends():
    from datasketch_tpu import TpuHNSW
    from datasketch_tpu.models.tpu_ensemble import TpuMinHashLSHEnsemble

    rng = np.random.RandomState(40)
    texts = [_random_text(rng, 300) for _ in range(24)]
    ann = TpuHNSW("minhash_jaccard", m=4, ef=16)
    ann.index_text(list(range(24)), texts, k=9, seed=2)
    qsigs = MinHash.bulk_from_text(texts[:4], k=9, hashfunc="device",
                                   seed=2, num_perm=128)
    rows = ann.query_batch(qsigs, k=3)
    assert all(row and row[0][0] == i for i, row in enumerate(rows))
    with pytest.raises(ValueError, match="minhash_jaccard"):
        TpuHNSW("l2").index_text([0], texts[:1])

    docs = [rng.choice(5000, size=50 + 10 * (i % 4),
                       replace=False).astype(np.uint32)
            for i in range(24)]
    ann2 = TpuHNSW("minhash_jaccard", m=4, ef=16)
    ann2.index_tokens(list(range(24)), docs, seed=1)
    tsigs = MinHash.bulk_signatures(docs[:4], num_perm=128, seed=1,
                                    hashfunc="device")
    rows = ann2.query_batch(tsigs, k=3)
    assert all(row and row[0][0] == i for i, row in enumerate(rows))

    ens = TpuMinHashLSHEnsemble(threshold=0.8, num_perm=128, num_part=4,
                                bucket_cap=16)
    ens.index_tokens(list(range(24)), docs, seed=1)
    hits = ens.query_batch(
        [(MinHash(hashvalues=row, hashfunc="device"),
          int(np.unique(docs[i]).size)) for i, row in enumerate(tsigs)]
    )
    assert all(i in row for i, row in enumerate(hits))


def test_sharded_index_text():
    import jax
    from jax.sharding import Mesh

    from datasketch_tpu.parallel import ShardedMinHashLSH

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("data",))
    rng = np.random.RandomState(36)
    texts = [_random_text(rng, 300) for _ in range(30)]
    dups = [t[:270] + _random_text(rng, 30) for t in texts[:5]]
    index = ShardedMinHashLSH(mesh, threshold=0.5, num_perm=128,
                              bucket_cap=64)
    index.index_text(list(range(30)), texts, k=9, seed=2)
    qsigs = MinHash.bulk_from_text(dups, k=9, hashfunc="device", seed=2,
                                   num_perm=128)
    rows = index.query_batch(
        [MinHash(hashvalues=row, hashfunc="device") for row in qsigs]
    )
    found = sum(1 for i, row in enumerate(rows) if i in row)
    assert found >= 4


def test_shingle_signatures_flat_axis_bucketed():
    """Distinct total byte counts within one pow-2 bucket must reuse one
    compiled program (the flat axis is padded like B and width are)."""
    import jax

    from datasketch_tpu.ops import text_ops

    def sig_for(texts):
        lengths = np.array([len(t) for t in texts], dtype=np.int32)
        flat = np.frombuffer(b"".join(texts), dtype=np.uint8)
        return text_ops.shingle_signatures_ragged(flat, lengths, 9, 1, 64)

    base = text_ops._window_hashes_device._cache_size()
    sig_for([b"a" * 40, b"b" * 30])
    n1 = text_ops._window_hashes_device._cache_size()
    sig_for([b"c" * 37, b"d" * 21])  # different total, same pow-2 bucket
    assert text_ops._window_hashes_device._cache_size() == n1
    assert n1 > base or base > 0
