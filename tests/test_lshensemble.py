"""MinHashLSHEnsemble tests (model: /root/reference/test/test_lshensemble.py
— randomized sets, query self-recall) plus partitioner properties."""

import numpy as np
import pytest

from datasketch_tpu import MinHash, MinHashLSHEnsemble
from datasketch_tpu.models.lshensemble import optimal_partitions, _nfps_matrix

from .utils import fake_hash_func


def _entries(n=40, seed=0, num_perm=128):
    rng = np.random.RandomState(seed)
    entries = []
    for i in range(n):
        size = int(rng.randint(10, 200))
        vals = [int(x) for x in rng.randint(0, 2**31, size)]
        m = MinHash(num_perm, hashfunc=fake_hash_func)
        m.update_batch(vals)
        entries.append((f"e{i}", m, len(set(vals)), set(vals)))
    return entries


class TestPartitioner:
    def test_edge_cases(self):
        sizes = np.array([1, 5, 10, 50])
        counts = np.array([3, 2, 1, 4])
        assert optimal_partitions(sizes, counts, 1) == [(1, 50)]
        assert optimal_partitions(sizes, counts, 4) == [(1, 1), (5, 5), (10, 10), (50, 50)]
        assert optimal_partitions(sizes, counts, 9) == [(1, 1), (5, 5), (10, 10), (50, 50)]

    def test_partitions_cover_domain(self):
        rng = np.random.RandomState(1)
        sizes = np.unique(rng.randint(1, 1000, 60))
        counts = rng.randint(1, 20, len(sizes))
        for num_part in (2, 3, 8):
            parts = optimal_partitions(sizes, counts, num_part)
            assert parts[0][0] == sizes[0]
            assert parts[-1][1] == sizes[-1]
            for (l1, u1), (l2, u2) in zip(parts, parts[1:]):
                assert u1 < l2
                # contiguous over the size domain
                between = sizes[(sizes > u1) & (sizes < l2)]
                assert len(between) == 0

    def test_nfps_matrix_matches_naive(self):
        rng = np.random.RandomState(2)
        sizes = np.unique(rng.randint(1, 100, 15)).astype(float)
        counts = rng.randint(1, 10, len(sizes)).astype(float)
        got = _nfps_matrix(counts, sizes)
        n = len(sizes)
        for l in range(n):
            for u in range(l, n):
                expect = np.sum(
                    (sizes[u] - sizes[l : u + 1]) / sizes[u] * counts[l : u + 1]
                )
                assert abs(got[l, u] - expect) < 1e-9


class TestMinHashLSHEnsemble:
    def test_init_validation(self):
        with pytest.raises(ValueError):
            MinHashLSHEnsemble(threshold=1.5)
        with pytest.raises(ValueError):
            MinHashLSHEnsemble(num_perm=1)
        with pytest.raises(ValueError):
            MinHashLSHEnsemble(num_part=0)
        with pytest.raises(ValueError):
            MinHashLSHEnsemble(m=1)
        with pytest.raises(ValueError):
            MinHashLSHEnsemble(weights=(0.6, 0.6))

    def test_index_and_self_recall(self):
        ens = MinHashLSHEnsemble(threshold=0.8, num_perm=128, num_part=4)
        entries = _entries()
        ens.index([(k, m, s) for k, m, s, _ in entries])
        assert not ens.is_empty()
        recalled = 0
        for k, m, s, _ in entries:
            if k in set(ens.query(m, s)):
                recalled += 1
        assert recalled / len(entries) > 0.9

    def test_index_once_only(self):
        ens = MinHashLSHEnsemble(threshold=0.8, num_perm=128, num_part=2)
        entries = _entries(10)
        ens.index([(k, m, s) for k, m, s, _ in entries])
        with pytest.raises(ValueError):
            ens.index([(k, m, s) for k, m, s, _ in entries])

    def test_bad_entries(self):
        ens = MinHashLSHEnsemble(threshold=0.8, num_perm=128, num_part=2)
        with pytest.raises(ValueError):
            ens.index([])
        m = MinHash(128)
        with pytest.raises(ValueError):
            ens.index([("a", m, 0)])

    def test_containment_behavior(self):
        """A small set fully contained in a big indexed set is found."""
        rng = np.random.RandomState(3)
        big = [int(x) for x in rng.randint(0, 2**31, 500)]
        mb = MinHash(128, hashfunc=fake_hash_func)
        mb.update_batch(big)
        others = _entries(20, seed=4)
        ens = MinHashLSHEnsemble(threshold=0.7, num_perm=128, num_part=4)
        ens.index(
            [("big", mb, len(set(big)))]
            + [(k, m, s) for k, m, s, _ in others]
        )
        # query = subset of big
        sub = big[:60]
        ms = MinHash(128, hashfunc=fake_hash_func)
        ms.update_batch(sub)
        assert "big" in set(ens.query(ms, len(set(sub))))
        assert "big" in ens
        assert "nope" not in ens


def test_tpu_ensemble_matches_host_candidates():
    import numpy as np

    from datasketch_tpu import MinHash, MinHashLSHEnsemble
    from datasketch_tpu.models.tpu_ensemble import TpuMinHashLSHEnsemble

    rng = np.random.RandomState(0)
    universe = rng.randint(0, 2**31, size=2000)
    entries, sets = [], []
    for i in range(60):
        size = rng.randint(10, 200)
        items = rng.choice(universe, size=size, replace=False)
        m = MinHash(num_perm=128)
        m.update_batch([int(v).to_bytes(8, "little") for v in items])
        entries.append(("k%d" % i, m, len(items)))
        sets.append(set(int(v) for v in items))

    host = MinHashLSHEnsemble(threshold=0.6, num_perm=128, num_part=8)
    host.index(entries)
    tpu = TpuMinHashLSHEnsemble(threshold=0.6, num_perm=128, num_part=8,
                                bucket_cap=64)
    tpu.index(entries)
    assert "k0" in tpu and not tpu.is_empty()

    for i in (0, 7, 23):
        key, mh, size = entries[i]
        host_res = set(host.query(mh, size))
        # band parity is a property of the BAND path (the scan path
        # thresholds the containment estimate instead — tested below)
        tpu_res = set(tpu.query(mh, size, method="bands"))
        assert key in tpu_res  # self containment = 1
        # fingerprint collisions can only ADD candidates vs byte-key tables
        assert host_res <= tpu_res

    # batch form agrees with the generator form
    batch = tpu.query_batch([(entries[0][1], entries[0][2])])
    assert set(batch[0]) == set(tpu.query(entries[0][1], entries[0][2]))

    import pytest

    with pytest.raises(ValueError):
        tpu.index(entries)  # one-shot


def test_tpu_ensemble_mixed_r_queries():
    """Queries whose x/q ratios select DIFFERENT (b, r) pairs must each
    probe with their own parameters inside the stacked per-r dispatch."""
    import numpy as np

    from datasketch_tpu import MinHash
    from datasketch_tpu.models.tpu_ensemble import TpuMinHashLSHEnsemble

    rng = np.random.RandomState(4)
    universe = rng.randint(0, 2**31, size=30000)
    entries, sets = [], []
    # extreme size spread forces several partitions AND several r picks
    for i, size in enumerate([10, 12, 15, 40, 45, 60, 300, 350, 420,
                              1500, 1800, 2400]):
        items = rng.choice(universe, size=size, replace=False)
        m = MinHash(num_perm=128)
        m.update_batch([int(v).to_bytes(8, "little") for v in items])
        entries.append((f"k{i}", m, size))
        sets.append(items)
    ens = TpuMinHashLSHEnsemble(threshold=0.7, num_perm=128, num_part=4,
                                bucket_cap=32)
    ens.index(entries)

    # every entry must find itself (containment 1.0) regardless of which
    # r its partition/ratio picks — pinned to the BAND path (this test
    # exercises the stacked per-r dispatch; auto may pick the scan)
    pairs = [(m, s) for _, m, s in entries]
    rows = ens.query_batch(pairs, method="bands")
    for i, row in enumerate(rows):
        assert f"k{i}" in row, (i, row)

    # a strict subset query: high containment in its superset
    sub_items = sets[-1][:1200]
    m = MinHash(num_perm=128)
    m.update_batch([int(v).to_bytes(8, "little") for v in sub_items])
    res = list(ens.query(m, len(sub_items), method="bands"))
    assert "k11" in res


def test_tpu_ensemble_save_load_roundtrip(tmp_path):
    import numpy as np

    from datasketch_tpu import MinHash
    from datasketch_tpu.models.tpu_ensemble import TpuMinHashLSHEnsemble

    rng = np.random.RandomState(9)
    universe = rng.randint(0, 2**31, size=3000)
    entries = []
    for i in range(40):
        size = rng.randint(10, 300)
        items = rng.choice(universe, size=size, replace=False)
        m = MinHash(num_perm=128)
        m.update_batch([int(v).to_bytes(8, "little") for v in items])
        entries.append((f"k{i}", m, size))
    ens = TpuMinHashLSHEnsemble(threshold=0.6, num_perm=128, num_part=4,
                                bucket_cap=32)

    import pytest

    with pytest.raises(ValueError):
        ens.save(str(tmp_path / "empty.npz"))
    ens.index(entries)
    path = str(tmp_path / "ens.npz")
    ens.save(path)
    back = TpuMinHashLSHEnsemble.load(path)
    assert len(back) == len(ens) and "k0" in back
    pairs = [(m, s) for _, m, s in entries[:10]]
    a = [set(r) for r in ens.query_batch(pairs)]
    b = [set(r) for r in back.query_batch(pairs)]
    assert a == b


class TestEnsembleContainmentScan:
    """method='scan': one streamed containment-estimate pass
    (ops/lsh_ops.containment_scan) replacing the stacked band probes."""

    def _build(self, n=120, threshold=0.7, seed=3):
        import numpy as np

        from datasketch_tpu import MinHash
        from datasketch_tpu.models.tpu_ensemble import TpuMinHashLSHEnsemble

        rng = np.random.RandomState(seed)
        sets = []
        for _ in range(n):
            size = rng.randint(20, 200)
            sets.append(np.unique(rng.randint(0, 4000, size)))
        docs = [[int(t).to_bytes(8, "little") for t in s] for s in sets]
        sigs = MinHash.bulk_signatures(docs, num_perm=128)
        ens = TpuMinHashLSHEnsemble(
            threshold=threshold, num_perm=128, num_part=4
        )
        ens.index((i, sigs[i], len(sets[i])) for i in range(n))
        return ens, sets, sigs

    def test_scan_matches_exact_containment(self):
        import numpy as np

        from datasketch_tpu import MinHash

        threshold = 0.7
        ens, sets, _sigs = self._build(threshold=threshold)
        rng = np.random.RandomState(11)
        queries, truth = [], []
        for qi in range(16):
            s = sets[qi]
            q = s[rng.rand(len(s)) < 0.75]
            if not len(q):
                q = s[:1]
            doc = [int(t).to_bytes(8, "little") for t in q]
            m = MinHash(num_perm=128)
            m.update_batch(doc)
            queries.append((m, len(q)))
            truth.append({
                j for j, ss in enumerate(sets)
                if np.intersect1d(q, ss, assume_unique=True).size / len(q)
                >= threshold
            })
        found = [set(r) for r in ens.query_batch(queries, method="scan")]
        # the scan thresholds the containment ESTIMATE: every query must
        # recover its superset (containment 1.0 is far from the cutoff)
        # and overall precision/recall must beat raw banding by a wide
        # margin (banding admits collision noise)
        hits = sum(qi in f for qi, f in enumerate(found))
        assert hits >= 15, hits
        ps = [len(f & t) / len(f) for f, t in zip(found, truth) if f]
        rs = [len(f & t) / len(t) for f, t in zip(found, truth) if t]
        import numpy as _np

        assert float(_np.mean(ps)) >= 0.9
        assert float(_np.mean(rs)) >= 0.9

    def test_auto_picks_scan_when_table_is_small(self):
        ens, sets, sigs = self._build()
        pairs = [(sigs[i], len(sets[i])) for i in range(8)]
        a = [set(r) for r in ens.query_batch(pairs, method="auto")]
        b = [set(r) for r in ens.query_batch(pairs, method="scan")]
        assert a == b  # the auto rule picks the scan at this size

    def test_scan_requires_sizes(self):
        import pytest

        ens, sets, sigs = self._build()
        # simulate a pre-sizes checkpoint (the device copy is lazy and
        # derived from the host table, so the host table is the truth)
        ens._sizes_host = None
        with pytest.raises(ValueError, match="sizes"):
            ens.query_batch([(sigs[0], len(sets[0]))], method="scan")
        # auto degrades to bands instead of raising
        rows = ens.query_batch([(sigs[0], len(sets[0]))], method="auto")
        assert 0 in rows[0]

    def test_scan_truncation_accounting(self):
        import numpy as np

        from datasketch_tpu import MinHash
        from datasketch_tpu.models.tpu_ensemble import TpuMinHashLSHEnsemble

        # 40 identical sets: every query matches all of them; max_results
        # caps the fetch and the overflow must be counted, never silent
        s = np.arange(50, dtype=np.int64)
        doc = [int(t).to_bytes(8, "little") for t in s]
        sigs = MinHash.bulk_signatures([doc] * 40, num_perm=128)
        ens = TpuMinHashLSHEnsemble(
            threshold=0.5, num_perm=128, num_part=2, max_results=8
        )
        ens.index((i, sigs[i], 50) for i in range(40))
        rows = ens.query_batch([(sigs[0], 50)], method="scan")
        assert len(rows[0]) == 8
        assert ens.last_truncated == 40 - 8

    def test_save_load_preserves_scan(self, tmp_path):
        from datasketch_tpu.models.tpu_ensemble import TpuMinHashLSHEnsemble

        ens, sets, sigs = self._build(n=60)
        pairs = [(sigs[i], len(sets[i])) for i in range(6)]
        path = str(tmp_path / "ens_scan.npz")
        ens.save(path)
        back = TpuMinHashLSHEnsemble.load(path)
        a = [set(r) for r in ens.query_batch(pairs, method="scan")]
        b = [set(r) for r in back.query_batch(pairs, method="scan")]
        assert a == b

    def test_bad_method_rejected(self):
        import pytest

        ens, sets, sigs = self._build(n=40)
        with pytest.raises(ValueError, match="method"):
            ens.query_batch([(sigs[0], len(sets[0]))], method="nope")


class TestEnsembleQueryStream:
    def test_stream_matches_batch(self):
        import numpy as np

        from datasketch_tpu import MinHash
        from datasketch_tpu.models.tpu_ensemble import TpuMinHashLSHEnsemble

        rng = np.random.RandomState(9)
        docs = [
            [int(t).to_bytes(8, "little")
             for t in rng.randint(0, 4000, rng.randint(30, 120))]
            for _ in range(256)
        ]
        sigs = MinHash.bulk_signatures(docs, num_perm=128)
        ens = TpuMinHashLSHEnsemble(threshold=0.6, num_perm=128, num_part=4)
        ens.index((i, sigs[i], len(docs[i])) for i in range(256))
        queries = [(sigs[i], len(docs[i])) for i in range(64)]
        batches = [queries[i : i + 16] for i in range(0, 64, 16)]
        want = [ens.query_batch(b, method="scan") for b in batches]
        got = list(ens.query_stream(batches, depth=3))
        assert len(got) == len(want)
        for w_rows, g_rows in zip(want, got):
            for w, g in zip(w_rows, g_rows):
                assert set(w) == set(g)

    def test_stream_requires_sizes(self):
        import pytest

        from datasketch_tpu.models.tpu_ensemble import TpuMinHashLSHEnsemble
        import numpy as np
        from datasketch_tpu import MinHash

        docs = [[b"a", b"b", b"c"], [b"a", b"b", b"d"]]
        sigs = MinHash.bulk_signatures(docs, num_perm=128)
        ens = TpuMinHashLSHEnsemble(threshold=0.6, num_perm=128, num_part=2)
        ens.index((i, sigs[i], 3) for i in range(2))
        ens._sizes_host = None  # simulate a pre-sizes checkpoint
        with pytest.raises(ValueError, match="sizes"):
            list(ens.query_stream([[(sigs[0], 3)]]))
