"""TpuMinHashLSH (device-resident index) tests: agreement with the
host/storage MinHashLSH on the same data, truncation reporting, top-k."""

import numpy as np
import pytest

from datasketch_tpu import MinHash, MinHashLSH
from datasketch_tpu.models.tpu_lsh import TpuMinHashLSH
from datasketch_tpu.ops import lsh_ops

from .utils import fake_hash_func


def _make_minhashes(n_docs=60, num_perm=64, seed=0):
    rng = np.random.RandomState(seed)
    universe = rng.randint(0, 2**31, size=500)
    ms, sets = [], []
    for i in range(n_docs):
        size = rng.randint(20, 80)
        items = rng.choice(universe, size=size, replace=False)
        m = MinHash(num_perm, hashfunc=fake_hash_func)
        m.update_batch([int(v) for v in items])
        ms.append(m)
        sets.append(set(int(v) for v in items))
    return ms, sets


class TestLshOps:
    def test_band_fingerprints_deterministic_and_band_local(self):
        rng = np.random.RandomState(0)
        sigs = rng.randint(0, 2**32, size=(10, 64), dtype=np.uint64).astype(np.uint32)
        f1 = np.asarray(lsh_ops.band_fingerprints(sigs, 8, 8))
        f2 = np.asarray(lsh_ops.band_fingerprints(sigs.copy(), 8, 8))
        np.testing.assert_array_equal(f1, f2)
        # same band values -> same fingerprint regardless of other bands
        sigs2 = sigs.copy()
        sigs2[:, 8:] = 0
        f3 = np.asarray(lsh_ops.band_fingerprints(sigs2, 8, 8))
        np.testing.assert_array_equal(f1[:, 0], f3[:, 0])

    def test_build_and_query_roundtrip(self):
        rng = np.random.RandomState(1)
        sigs = rng.randint(0, 2**32, size=(100, 64), dtype=np.uint64).astype(np.uint32)
        fps = lsh_ops.band_fingerprints(sigs, 8, 8)
        table_fp, table_ids = lsh_ops.build_tables(fps)
        # query with the same signatures: each doc must find itself
        ids, trunc = lsh_ops.query_tables(table_fp, table_ids, fps, cap=16)
        ids = np.asarray(ids)
        assert int(trunc) == 0
        for i in range(100):
            assert i in set(ids[i].ravel())

    def test_truncation_reported(self):
        # all docs identical -> every bucket has 50 members, cap 8 truncates
        sigs = np.tile(
            np.arange(64, dtype=np.uint32)[None, :], (50, 1)
        )
        fps = lsh_ops.band_fingerprints(sigs, 8, 8)
        t_fp, t_ids = lsh_ops.build_tables(fps)
        ids, trunc = lsh_ops.query_tables(t_fp, t_ids, fps[:1], cap=8)
        assert int(trunc) == (50 - 8) * 8  # per band

    def test_rerank_matches_host_jaccard(self):
        rng = np.random.RandomState(2)
        db = rng.randint(0, 2**32, size=(30, 64), dtype=np.uint64).astype(np.uint32)
        q = db[:5].copy()
        cand = np.tile(np.arange(30, dtype=np.int32)[None, :], (5, 1))
        scores = np.asarray(lsh_ops.rerank_jaccard(db, q, cand))
        for qi in range(5):
            for ci in range(30):
                expect = (db[ci] == q[qi]).mean()
                assert abs(scores[qi, ci] - expect) < 1e-6


class TestTpuMinHashLSH:
    def test_agrees_with_host_lsh(self):
        ms, _ = _make_minhashes()
        host = MinHashLSH(threshold=0.5, num_perm=64)
        tpu = TpuMinHashLSH(threshold=0.5, num_perm=64, rerank=False, bucket_cap=64)
        keys = [f"doc{i}" for i in range(len(ms))]
        for k, m in zip(keys, ms):
            host.insert(k, m)
        tpu.index(keys, ms)
        for i, m in enumerate(ms):
            host_res = set(host.query(m))
            tpu_res = set(tpu.query(m))
            # fingerprint collisions can only ADD candidates
            assert host_res <= tpu_res
            assert keys[i] in tpu_res

    def test_rerank_filters(self):
        ms, sets = _make_minhashes()
        keys = [f"doc{i}" for i in range(len(ms))]
        tpu = TpuMinHashLSH(threshold=0.9, num_perm=64, rerank=True, bucket_cap=64)
        tpu.index(keys, ms)
        res = tpu.query(ms[0])
        assert keys[0] in res  # self-similarity 1.0 >= 0.9

    def test_incremental_insert(self):
        ms, _ = _make_minhashes(n_docs=20)
        tpu = TpuMinHashLSH(threshold=0.5, num_perm=64, rerank=False)
        for i, m in enumerate(ms[:10]):
            tpu.insert(f"d{i}", m)
        assert f"d3" in tpu.query(ms[3])
        tpu.index([f"d{i}" for i in range(10, 20)], ms[10:])
        assert "d15" in tpu.query(ms[15])
        assert len(tpu) == 20
        import pytest

        with pytest.raises(ValueError):
            tpu.insert("d3", ms[3])

    def test_top_k_scores_sorted(self):
        ms, _ = _make_minhashes(n_docs=40)
        tpu = TpuMinHashLSH(threshold=0.3, num_perm=64, bucket_cap=64)
        tpu.index([f"d{i}" for i in range(40)], ms)
        top = tpu.top_k([ms[0]], k=5)[0]
        assert top[0][0] == "d0" and abs(top[0][1] - 1.0) < 1e-6
        scores = [s for _, s in top]
        assert scores == sorted(scores, reverse=True)

    def test_empty_index(self):
        tpu = TpuMinHashLSH(threshold=0.5, num_perm=64)
        ms, _ = _make_minhashes(n_docs=1)
        assert tpu.query(ms[0]) == []
        assert tpu.is_empty()


def test_remove_and_compact():
    import numpy as np

    from datasketch_tpu import MinHash
    from datasketch_tpu.models.tpu_lsh import TpuMinHashLSH

    rng = np.random.RandomState(3)
    base = rng.randint(0, 1 << 32, size=(128,), dtype=np.uint64)
    sigs = []
    for i in range(12):
        hv = base.copy()
        flip = rng.rand(128) < 0.1 * (i % 4)
        hv[flip] = rng.randint(0, 1 << 32, size=int(flip.sum()), dtype=np.uint64)
        sigs.append(hv)
    mhs = [MinHash(num_perm=128, hashvalues=s) for s in sigs]
    index = TpuMinHashLSH(threshold=0.5, num_perm=128)
    index.index([f"k{i}" for i in range(12)], mhs)

    assert "k1" in index.query(mhs[1])
    index.remove("k1")
    assert "k1" not in index
    assert len(index) == 11
    assert "k1" not in index.query(mhs[1])
    assert all(k != "k1" for k, _ in index.top_k([mhs[1]], 5)[0])

    import pytest

    with pytest.raises(ValueError):
        index.remove("k1")

    index.compact()
    assert len(index) == 11
    assert "k0" in index.query(mhs[0])
    # re-inserting a removed key works after compaction
    index.insert("k1", mhs[1])
    assert "k1" in index.query(mhs[1])


def test_device_upload_roundtrip():
    import numpy as np

    from datasketch_tpu.ops.transfer import device_upload

    rng = np.random.RandomState(0)
    for n in (5, 1000, 4097):
        x = rng.randint(0, 2**31, size=(n, 16), dtype=np.uint32)
        d = device_upload(x, chunk_bytes=4096)
        assert np.array_equal(np.asarray(d), x)


def test_direct_addressed_tables_match_binary_search():
    import numpy as np
    import jax.numpy as jnp

    from datasketch_tpu.ops import lsh_ops

    rng = np.random.RandomState(8)
    sigs = jnp.asarray(
        rng.randint(0, 1 << 32, size=(500, 128), dtype=np.uint64).astype(np.uint32)
    )
    b, r, nb = 16, 8, 256
    fps = lsh_ops.band_fingerprints(sigs, b, r)
    sfp, sid = lsh_ops.build_tables(fps)
    off = lsh_ops.build_offsets(sfp, nb)
    q = fps[:32]
    ids_a, tr_a = lsh_ops.query_tables(sfp, sid, q, cap=32)
    ids_b, tr_b = lsh_ops.query_tables_direct(sfp, sid, off, q, 32, nb)
    for ra, rb in zip(np.asarray(ids_a).reshape(32, -1),
                      np.asarray(ids_b).reshape(32, -1)):
        assert set(ra[ra >= 0]) == set(rb[rb >= 0])

    t_a = lsh_ops.topk_fused(sfp, sid, sigs, sigs[:8], b, r, 32, 5)
    t_b = lsh_ops.topk_fused(sfp, sid, sigs, sigs[:8], b, r, 32, 5,
                             offsets=off, n_buckets=nb)
    np.testing.assert_array_equal(np.asarray(t_a[0]), np.asarray(t_b[0]))


def test_topk_prefilter_equivalent():
    import numpy as np
    import jax.numpy as jnp

    from datasketch_tpu.ops import lsh_ops

    rng = np.random.RandomState(4)
    ids_np = rng.randint(-1, 40, size=(16, 200)).astype(np.int32)
    # LSH invariant: every occurrence of an id carries the same rerank score
    per_id = rng.rand(16, 41).astype(np.float32)
    scores_np = np.take_along_axis(per_id, (ids_np % 41), axis=1)
    scores = jnp.asarray(scores_np)
    ids = jnp.asarray(ids_np)
    a_ids, a_sc = lsh_ops.topk_candidates(scores, ids, 5)
    b_ids, b_sc = lsh_ops.topk_candidates(scores, ids, 5, max_dup=8)
    # prefilter keeps top 40 scores; with <=8 dups per id the top-5 unique
    # ids are preserved
    np.testing.assert_allclose(np.asarray(a_sc), np.asarray(b_sc), atol=1e-6)


def test_save_load_roundtrip(tmp_path):
    import numpy as np

    from datasketch_tpu import MinHash
    from datasketch_tpu.models.tpu_lsh import TpuMinHashLSH

    rng = np.random.RandomState(2)
    sigs = rng.randint(0, 1 << 32, size=(10, 128), dtype=np.uint64)
    mhs = [MinHash(num_perm=128, hashvalues=s) for s in sigs]
    index = TpuMinHashLSH(threshold=0.7, num_perm=128)
    index.index(["k%d" % i for i in range(10)], mhs)
    index.remove("k3")

    path = str(tmp_path / "idx.npz")
    index.save(path)
    loaded = TpuMinHashLSH.load(path)
    assert loaded.b == index.b and loaded.r == index.r
    assert len(loaded) == 9 and "k3" not in loaded
    for i in (0, 5, 9):
        if i == 3:
            continue
        assert "k%d" % i in loaded.query(mhs[i])
    assert "k3" not in loaded.query(mhs[3])


def test_weighted_minhash_in_device_lsh():
    import numpy as np

    from datasketch_tpu import WeightedMinHashGenerator
    from datasketch_tpu.models.tpu_lsh import TpuMinHashLSH

    rng = np.random.RandomState(0)
    gen = WeightedMinHashGenerator(50, sample_size=128, seed=1)
    base = rng.uniform(0, 3, 50)
    rows = [base * rng.uniform(0.8, 1.2, 50) for _ in range(6)]
    rows += [rng.uniform(0, 3, 50) for _ in range(6)]  # unrelated
    wms = [gen.minhash(r) for r in rows]

    index = TpuMinHashLSH(threshold=0.5, num_perm=128, bucket_cap=64)
    index.index(["w%d" % i for i in range(12)], wms)
    res = index.query(wms[0])
    assert "w0" in res  # self
    # scores match host weighted-jaccard estimates
    scored = dict(index.query_batch([wms[0]], return_scores=True)[0])
    for key, score in scored.items():
        j = int(key[1:])
        assert abs(score - wms[0].jaccard(wms[j])) < 1e-6


class TestMergeAndStatus:
    def _index(self, lo, hi, num_perm=128):
        from datasketch_tpu import TpuMinHashLSH

        docs = [[b"d%d-%d" % (i, t) for t in range(30)] for i in range(lo, hi)]
        sigs = MinHash.bulk_signatures(docs, num_perm=num_perm)
        idx = TpuMinHashLSH(threshold=0.5, num_perm=num_perm, bucket_cap=32)
        idx.index(["k%d" % i for i in range(lo, hi)], sigs)
        return idx, sigs

    def test_merge_unions_indexes(self):
        a, sa = self._index(0, 20)
        b, sb = self._index(20, 35)
        b.remove("k33")
        a.merge(b)
        assert len(a) == 34 and "k33" not in a
        qa = MinHash(num_perm=128, hashvalues=sa[3])
        qb = MinHash(num_perm=128, hashvalues=sb[5])
        assert "k3" in a.query(qa)
        assert "k25" in a.query(qb)
        assert "k33" not in a.query(MinHash(num_perm=128, hashvalues=sb[13]))

    def test_merge_validation(self):
        import pytest

        from datasketch_tpu import TpuMinHashLSH

        a, _ = self._index(0, 5)
        with pytest.raises(ValueError):
            a.merge(TpuMinHashLSH(threshold=0.5, num_perm=64))
        b, _ = self._index(0, 5)
        with pytest.raises(ValueError):
            a.merge(b, check_overlap=True)
        a.merge(TpuMinHashLSH(threshold=0.5, num_perm=128))  # empty: no-op
        assert len(a) == 5

    def test_status_counters(self):
        idx, sigs = self._index(0, 130)  # force padding past 128
        idx.remove("k7")
        st = idx.status()
        assert st["n_live"] == 129 and st["n_tombstoned"] == 1
        assert st["n_padded"] == 256 - 130
        assert st["bands"] == idx.b and st["rows_per_band"] == idx.r
        assert st["device_bytes"] > 0
        assert 1 <= st["max_bucket"] <= 256
        assert st["distinct_buckets_min"] >= 1
        empty = type(idx)(threshold=0.5, num_perm=128)
        st0 = empty.status()
        assert st0["n_live"] == 0 and st0["device_bytes"] == 0


def test_topk_scan_matches_bruteforce_and_bands():
    """method='scan' must equal host brute force over stored signatures
    (score multisets; ties may reorder) and respect tombstones."""
    rng = np.random.RandomState(0)
    docs = [
        [int(t).to_bytes(8, "little") for t in rng.choice(5000, size=80, replace=False)]
        for _ in range(300)
    ]
    sigs = MinHash.bulk_signatures(docs, num_perm=128)
    mhs = [MinHash(num_perm=128, hashvalues=r) for r in sigs]
    ix = TpuMinHashLSH(threshold=0.2, num_perm=128, bucket_cap=64)
    ix.index(list(range(len(mhs))), mhs)
    qs = mhs[:6]

    scan = ix.top_k(qs, k=5, method="scan")
    auto = ix.top_k(qs, k=5)  # N=300 <= Q*b*cap -> auto picks scan
    bands = ix.top_k(qs, k=5, method="bands")
    H = sigs.astype(np.int64)
    for i in range(6):
        assert scan[i][0][0] == i and abs(scan[i][0][1] - 1.0) < 1e-6
        assert auto[i] == scan[i]
        assert bands[i][0][0] == i
        jac = (H == H[i]).mean(axis=1)
        want = sorted(np.round(np.sort(jac)[::-1][:5], 6))
        got = sorted(round(s, 6) for _, s in scan[i])
        assert want == got, (i, want, got)

    ix.remove(0)
    after = ix.top_k([mhs[0]], k=5, method="scan")[0]
    assert all(key != 0 for key, _ in after)
    assert ix.last_truncated == 0

    with pytest.raises(ValueError):
        ix.top_k(qs, k=5, method="bogus")


def test_top_k_stream_matches_sync():
    rng = np.random.RandomState(3)
    docs = [
        [int(t).to_bytes(8, "little") for t in rng.choice(3000, size=60, replace=False)]
        for _ in range(200)
    ]
    mhs = [
        MinHash(num_perm=128, hashvalues=r)
        for r in MinHash.bulk_signatures(docs, num_perm=128)
    ]
    ix = TpuMinHashLSH(threshold=0.2, num_perm=128, bucket_cap=64)
    ix.index(list(range(len(mhs))), mhs)
    qs = mhs[:8]
    sync = ix.top_k(qs, k=4)
    # depth > number of batches exercises the drain loop; varying batch
    # content exercises per-batch formatting
    batches = [qs, qs[:8], list(reversed(qs))]
    out = list(ix.top_k_stream(batches, k=4, depth=5))
    assert out[0] == sync and out[1] == sync
    assert out[2] == list(reversed(sync))
    # empty index yields empty rows per batch
    empty = TpuMinHashLSH(threshold=0.2, num_perm=128)
    assert list(empty.top_k_stream([qs[:3]], k=4)) == [[[], [], []]]
    with pytest.raises(ValueError):
        list(empty.top_k_stream([qs], k=4, method="nope"))


def test_warmup_noop_and_compiles():
    ix = TpuMinHashLSH(threshold=0.5, num_perm=64)
    ix.warmup()  # empty index: no-op
    ms, _ = _make_minhashes(n_docs=20)
    ix.index([f"w{i}" for i in range(20)], ms)
    ix.warmup(batch_sizes=(4,), k=3)
    # warmed shapes answer without error and with correct self-recall
    assert ix.top_k(ms[:4], k=3)[0][0][0] == "w0"


class TestSignatureCascade:
    """cascade_perm: band at num_perm, score at a wider width (round-4
    recall lift, VERDICT round 3 #7)."""

    def _clustered(self, n=240, seed=11):
        rng = np.random.RandomState(seed)
        docs = []
        for c in range(n // 3):
            base = [b"c%d-%d" % (c, t) for t in range(40)]
            docs.append(list(base))
            for _ in range(2):
                d = list(base)
                for j in rng.choice(40, size=rng.randint(4, 14),
                                    replace=False):
                    d[j] = b"x%d-%d" % (c, rng.randint(1 << 20))
                docs.append(d)
        return docs

    def test_prefix_stability_and_recall_gain(self):
        from datasketch_tpu import MinHash, TpuMinHashLSH

        docs = self._clustered()
        wide = MinHash.bulk_signatures(docs, num_perm=512)
        base = MinHash.bulk_signatures(docs, num_perm=128)
        # permutation families are prefix-stable: the cascade's banding
        # slots ARE the base signatures
        np.testing.assert_array_equal(wide[:, :128], base)

        # exact-Jaccard ground truth
        sets = [set(d) for d in docs]
        nq = 24
        gt = []
        for qi in range(nq):
            js = np.array([
                len(sets[qi] & s) / len(sets[qi] | s) if j != qi else -1
                for j, s in enumerate(sets)
            ])
            gt.append(set(np.argsort(-js)[:5].tolist()))

        def recall(index, sigs):
            rows = index.top_k(sigs[:nq], k=5)
            hits = sum(
                len(gt[qi] & {k for k, _ in row if k != qi})
                for qi, row in enumerate(rows)
            )
            return hits / (nq * 5)

        plain = TpuMinHashLSH(threshold=0.3, num_perm=128, bucket_cap=64)
        plain.index(list(range(len(docs))), base)
        casc = TpuMinHashLSH(threshold=0.3, num_perm=128, bucket_cap=64,
                             cascade_perm=512)
        casc.index(list(range(len(docs))), wide)
        r_plain, r_casc = recall(plain, base), recall(casc, wide)
        assert r_casc >= r_plain, (r_casc, r_plain)
        # threshold queries score at the wide width too
        scored = dict(
            casc.query_batch(wide[:1], return_scores=True,
                             threshold=0.2)[0]
        )
        true0 = max(
            len(sets[0] & sets[j]) / len(sets[0] | sets[j])
            for j in (1, 2)
        )
        hit = [s for k, s in scored.items() if k in (1, 2)]
        assert hit and abs(max(hit) - true0) < 0.15

    def test_cascade_validation_and_persistence(self, tmp_path):
        import pytest

        from datasketch_tpu import MinHash, TpuMinHashLSH

        with pytest.raises(ValueError):
            TpuMinHashLSH(num_perm=128, cascade_perm=64)
        docs = self._clustered(n=48)
        wide = MinHash.bulk_signatures(docs, num_perm=256)
        idx = TpuMinHashLSH(threshold=0.3, num_perm=128, cascade_perm=256,
                            bucket_cap=32)
        with pytest.raises(ValueError):  # base-width rows rejected
            idx.index(list(range(len(docs))), wide[:, :128])
        idx.index(list(range(len(docs))), wide)
        with pytest.raises(ValueError):  # base-width queries rejected
            idx.query_batch(wide[:2, :128])
        path = str(tmp_path / "casc.npz")
        idx.save(path)
        loaded = TpuMinHashLSH.load(path)
        assert loaded.cascade_perm == 256 and loaded.h == 128
        assert loaded.top_k(wide[:2], k=3) == idx.top_k(wide[:2], k=3)


def test_scan_escalation_returns_all_matches():
    """The threshold scan serves at a fused-kernel-sized k (128) and
    must escalate to the full max_results when a query's exact match
    count overflows — no result may be silently dropped."""
    import numpy as np

    from datasketch_tpu import MinHash
    from datasketch_tpu.models.tpu_lsh import TpuMinHashLSH

    rng = np.random.RandomState(5)
    doc = [int(t).to_bytes(8, "little") for t in range(50)]
    docs = [doc] * 300 + [
        [int(t).to_bytes(8, "little") for t in rng.randint(1000, 5000, 40)]
        for _ in range(200)
    ]
    sigs = MinHash.bulk_signatures(docs, num_perm=128)
    idx = TpuMinHashLSH(threshold=0.5, num_perm=128, max_results=512)
    idx.index(list(range(500)), sigs)
    rows = idx.query_batch(sigs[:4], method="scan")
    assert all(len(r) == 300 for r in rows)
    assert idx.last_truncated == 0
    # the fast path (no overflow) still answers exactly
    sparse = idx.query_batch(sigs[320:324], method="scan")
    assert all(r == [320 + i] for i, r in enumerate(sparse))
    # max_results still caps (and reports) when the true count exceeds it
    idx2 = TpuMinHashLSH(threshold=0.5, num_perm=128, max_results=64)
    idx2.index(list(range(500)), sigs)
    rows2 = idx2.query_batch(sigs[:2], method="scan")
    assert all(len(r) == 64 for r in rows2)
    assert idx2.last_truncated == 2 * (300 - 64)
