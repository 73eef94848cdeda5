"""TpuMinHashLSHForest + forest_ops: device prefix-forest semantics."""

import os
import tempfile

import numpy as np
import pytest

from datasketch_tpu import MinHash, MinHashLSHForest, TpuMinHashLSHForest
from datasketch_tpu.ops import forest_ops


def _corpus_minhashes(n=64, num_perm=128, seed=0):
    rng = np.random.RandomState(seed)
    universe = [("tok-%d" % t).encode() for t in range(500)]
    sets, ms = [], []
    for i in range(n):
        toks = rng.choice(500, size=rng.randint(20, 80), replace=False)
        s = {universe[t] for t in toks}
        m = MinHash(num_perm=num_perm)
        m.update_batch(sorted(s))
        sets.append(s)
        ms.append(m)
    return sets, ms


class TestForestOps:
    def test_prefix_runs_match_bruteforce(self):
        """Every (tree, level) run returned by query_forest must equal the
        brute-force prefix-fingerprint match set."""
        rng = np.random.RandomState(3)
        sigs = rng.randint(0, 1 << 32, size=(40, 32), dtype=np.uint64).astype(
            np.uint32
        )
        # plant shared prefixes: rows 1,2 share row 0's first tree entirely,
        # row 3 shares only the first two slots
        sigs[1, :8] = sigs[0, :8]
        sigs[2, :8] = sigs[0, :8]
        sigs[3, :2] = sigs[0, :2]
        l, k, cap = 4, 8, 16
        fps = np.asarray(forest_ops.prefix_fingerprints(sigs, l, k))
        sorted_fps, sorted_ids = forest_ops.build_forest(fps)
        q_fps = np.asarray(forest_ops.prefix_fingerprints(sigs[:1], l, k))
        ids, trunc = forest_ops.query_forest(
            np.asarray(sorted_fps), np.asarray(sorted_ids), q_fps, cap
        )
        ids = np.asarray(ids)[0]  # [k, l*cap]
        assert int(trunc) == 0
        for lev in range(k):
            got = {int(i) for i in ids[lev] if i >= 0}
            expect = set()
            for tree in range(l):
                match = np.all(
                    fps[tree, : lev + 1, :] == fps[tree, : lev + 1, 0:1],
                    axis=0,
                )
                expect |= set(np.nonzero(match)[0].tolist())
            assert got == expect, f"level {lev}"

    def test_level_weight_beats_raw_jaccard(self):
        """A full-tree prefix match must outrank a higher-Jaccard row that
        only matches one slot per tree (the forest contract)."""
        rng = np.random.RandomState(7)
        q = rng.randint(0, 1 << 32, size=(1, 128), dtype=np.uint64).astype(
            np.uint32
        )
        db = rng.randint(0, 1 << 32, size=(4, 128), dtype=np.uint64).astype(
            np.uint32
        )
        l, k = 8, 16
        db[0] = rng.randint(0, 1 << 32, size=128, dtype=np.uint64).astype(
            np.uint32
        )
        db[0, :16] = q[0, :16]  # full first tree: level-16 match, jac=0.125
        db[1] = q[0]  # high jaccard...
        for t in range(l):
            db[1, t * k + 1] ^= 1  # ...but prefix depth 1 in every tree
        fps = forest_ops.prefix_fingerprints(db, l, k)
        sorted_fps, sorted_ids = forest_ops.build_forest(fps)
        ids, jac, lev, _ = forest_ops.forest_query_fused(
            sorted_fps, sorted_ids, db, q, l, k, 8, 4
        )
        ids = np.asarray(ids)[0]
        assert ids[0] == 0, "deep prefix match must rank first"
        assert ids[1] == 1
        assert int(np.asarray(lev)[0][0]) == 16
        assert np.asarray(jac)[0][1] == pytest.approx(1.0 - 8 / 128)

    def test_host_build_matches_device_build(self):
        rng = np.random.RandomState(5)
        sigs = rng.randint(0, 1 << 32, size=(200, 64), dtype=np.uint64).astype(
            np.uint32
        )
        sigs[10] = sigs[4]  # identical rows exercise stable tie-breaking
        l, k = 4, 16
        h_fps, h_ids = forest_ops.build_forest_host(sigs, l, k)
        d_fps, d_ids = forest_ops.build_forest(
            forest_ops.prefix_fingerprints(sigs, l, k)
        )
        np.testing.assert_array_equal(h_fps, np.asarray(d_fps))
        np.testing.assert_array_equal(h_ids, np.asarray(d_ids))

    def test_truncation_reported(self):
        sigs = np.tile(
            np.arange(16, dtype=np.uint32)[None, :], (32, 1)
        )  # 32 identical rows
        fps = forest_ops.prefix_fingerprints(sigs, 2, 8)
        sorted_fps, sorted_ids = forest_ops.build_forest(fps)
        q_fps = forest_ops.prefix_fingerprints(sigs[:1], 2, 8)
        _, trunc = forest_ops.query_forest(
            np.asarray(sorted_fps), np.asarray(sorted_ids), np.asarray(q_fps), 4
        )
        assert int(trunc) > 0


class TestTpuForest:
    def test_self_recall_and_scores(self):
        _, ms = _corpus_minhashes(n=50)
        forest = TpuMinHashLSHForest(num_perm=128, l=8)
        forest.index(list(range(50)), ms)
        res = forest.query_batch(ms[:10], 5, return_scores=True)
        for i, hits in enumerate(res):
            assert hits[0][0] == i
            assert hits[0][1] == pytest.approx(1.0)

    def test_matches_host_forest_recall(self):
        """Device forest recall@5 (vs true Jaccard) >= host forest's."""
        sets, ms = _corpus_minhashes(n=64, seed=11)
        host = MinHashLSHForest(num_perm=128, l=8)
        dev = TpuMinHashLSHForest(num_perm=128, l=8)
        for i, m in enumerate(ms):
            host.add(i, m)
        host.index()
        dev.index(list(range(64)), ms)

        def true_topk(qi, k=5):
            jac = [
                (len(sets[qi] & sets[j]) / len(sets[qi] | sets[j]), j)
                for j in range(len(sets))
            ]
            jac.sort(reverse=True)
            return {j for _, j in jac[:k]}

        host_hits = dev_hits = 0
        dev_res = dev.query_batch(ms[:20], 5)
        for qi in range(20):
            truth = true_topk(qi)
            host_hits += len(set(host.query(ms[qi], 5)) & truth)
            dev_hits += len(set(dev_res[qi]) & truth)
        assert dev_hits >= host_hits

    def test_add_index_lifecycle(self):
        _, ms = _corpus_minhashes(n=12)
        forest = TpuMinHashLSHForest(num_perm=128, l=8)
        assert forest.is_empty()
        for i in range(6):
            forest.add(i, ms[i])
        assert forest.is_empty()  # staged, not searchable
        assert 3 in forest and 7 not in forest
        forest.index()
        assert not forest.is_empty()
        assert forest.query(ms[0], 3)[0] == 0
        # add more after indexing; invisible until re-index
        forest.add(6, ms[6])
        assert 6 not in forest.query(ms[6], 3)
        forest.index()
        assert forest.query(ms[6], 3)[0] == 6
        assert len(forest) == 7

    def test_errors(self):
        _, ms = _corpus_minhashes(n=3)
        forest = TpuMinHashLSHForest(num_perm=128, l=8)
        with pytest.raises(ValueError):
            TpuMinHashLSHForest(num_perm=128, l=0)
        with pytest.raises(ValueError):
            TpuMinHashLSHForest(num_perm=4, l=8)
        forest.add("a", ms[0])
        with pytest.raises(ValueError):
            forest.add("a", ms[1])
        with pytest.raises(ValueError):
            forest.query(ms[0], 0)
        small = MinHash(num_perm=16)
        with pytest.raises(ValueError):
            forest.add("b", small)
        forest.index()
        with pytest.raises(ValueError):
            forest.query(small, 3)

    def test_padding_beyond_pow2(self):
        _, ms = _corpus_minhashes(n=130, seed=5)
        forest = TpuMinHashLSHForest(num_perm=128, l=8)
        forest.index(list(range(130)), ms)
        res = forest.query_batch([ms[0], ms[129]], 3)
        assert res[0][0] == 0 and res[1][0] == 129
        # padded filler rows must never leak
        for hits in forest.query_batch(ms[:8], 10):
            assert all(0 <= h < 130 for h in hits)

    def test_save_load_roundtrip(self):
        _, ms = _corpus_minhashes(n=20)
        forest = TpuMinHashLSHForest(num_perm=128, l=8, cap=32)
        forest.index(list(range(20)), ms)
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "forest.npz")
            forest.save(path)
            loaded = TpuMinHashLSHForest.load(path)
        assert len(loaded) == 20
        assert loaded.cap == 32
        q = forest.query_batch(ms[:5], 4)
        q2 = loaded.query_batch(ms[:5], 4)
        assert q == q2

    def test_get_minhash_hashvalues(self):
        _, ms = _corpus_minhashes(n=4)
        forest = TpuMinHashLSHForest(num_perm=128, l=8)
        forest.index([0, 1, 2, 3], ms)
        hv = forest.get_minhash_hashvalues(2)
        np.testing.assert_array_equal(
            hv, np.asarray(ms[2].hashvalues, np.uint64).astype(np.uint32)
        )
        with pytest.raises(KeyError):
            forest.get_minhash_hashvalues("missing")


class TestHostForestBatch:
    def test_query_batch_equals_scalar(self):
        _, ms = _corpus_minhashes(n=40, seed=9)
        forest = MinHashLSHForest(num_perm=128, l=8)
        for i, m in enumerate(ms):
            forest.add(i, m)
        forest.index()
        batch = forest.query_batch(ms[:15], 7)
        for qi in range(15):
            assert sorted(batch[qi]) == sorted(forest.query(ms[qi], 7))


def test_forest_status_counters():
    _, ms = _corpus_minhashes(n=20)
    forest = TpuMinHashLSHForest(num_perm=128, l=8)
    st = forest.status()
    assert st["n_indexed"] == 0 and st["device_bytes"] == 0
    for i in range(3):
        forest.add(i, ms[i])
    assert forest.status()["n_pending"] == 3
    forest.index()
    forest.index(list(range(3, 20)), ms[3:])
    st = forest.status()
    assert st["n_indexed"] == 20 and st["n_pending"] == 0
    assert st["n_padded"] == 128 - 20
    assert st["trees"] == 8 and st["prefix_len"] == 16
    assert st["device_bytes"] > 0 and st["max_leaf_run"] >= 1


def test_query_stream_matches_batch():
    import numpy as np

    from datasketch_tpu import MinHash
    from datasketch_tpu.models.tpu_forest import TpuMinHashLSHForest

    rng = np.random.RandomState(5)
    docs = [
        [int(t).to_bytes(8, "little") for t in rng.choice(2000, size=50, replace=False)]
        for _ in range(150)
    ]
    mhs = [
        MinHash(num_perm=128, hashvalues=r)
        for r in MinHash.bulk_signatures(docs, num_perm=128)
    ]
    f = TpuMinHashLSHForest(num_perm=128)
    for i, m in enumerate(mhs):
        f.add(i, m)
    f.index()
    qs = mhs[:8]
    sync = f.query_batch(qs, k=5, return_scores=True)
    out = list(f.query_stream([qs, qs[:8]], k=5, return_scores=True, depth=3))
    assert out == [sync, sync]
    empty = TpuMinHashLSHForest(num_perm=128)
    assert list(empty.query_stream([qs], k=5)) == [[[] for _ in qs]]


class TestJaccardRank:
    """rank='jaccard': pure estimated-Jaccard ordering of the pool."""

    def test_jaccard_rank_orders_by_score(self):
        _, ms = _corpus_minhashes(n=96, seed=11)
        forest = TpuMinHashLSHForest(num_perm=128, rank="jaccard")
        forest.index(list(range(96)), ms)
        rows = forest.query_batch(ms[:6], 8, return_scores=True)
        for qi, row in enumerate(rows):
            scores = [s for _, s in row]
            assert scores == sorted(scores, reverse=True)
            # self-match is exact: it must come first with jaccard 1.0
            assert row[0][0] == qi and row[0][1] == pytest.approx(1.0)

    def test_rank_override_per_call(self):
        _, ms = _corpus_minhashes(n=64, seed=12)
        forest = TpuMinHashLSHForest(num_perm=128)  # default 'forest'
        forest.index(list(range(64)), ms)
        base = forest.query_batch(ms[:4], 8)
        jac = forest.query_batch(ms[:4], 8, rank="jaccard")
        # same candidate walk: the self key is always present in both
        for qi in range(4):
            assert qi in base[qi] and qi in jac[qi]
        # override must not change the index default
        assert forest.rank == "forest"
        again = forest.query_batch(ms[:4], 8)
        assert again == base

    def test_jaccard_rank_recall_not_worse(self):
        """On a clustered corpus, pure-Jaccard ordering of the same pool
        must match or beat the depth-weighted ordering's recall@k vs the
        exact ground truth."""
        sets, ms = _corpus_minhashes(n=128, seed=13)
        forest = TpuMinHashLSHForest(num_perm=128)
        forest.index(list(range(128)), ms)
        k = 10

        def exact_topk(qi):
            js = [
                (len(sets[qi] & sets[j]) / len(sets[qi] | sets[j]), j)
                for j in range(128)
            ]
            js.sort(reverse=True)
            return {j for _, j in js[:k]}

        rec = {"forest": 0.0, "jaccard": 0.0}
        queries = list(range(16))
        for mode in rec:
            rows = forest.query_batch([ms[q] for q in queries], k, rank=mode)
            hits = sum(
                len(set(row) & exact_topk(q))
                for q, row in zip(queries, rows)
            )
            rec[mode] = hits / (k * len(queries))
        assert rec["jaccard"] >= rec["forest"]

    def test_rank_survives_save_load(self):
        _, ms = _corpus_minhashes(n=32, seed=14)
        forest = TpuMinHashLSHForest(num_perm=128, rank="jaccard")
        forest.index(list(range(32)), ms)
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "f.npz")
            forest.save(p)
            loaded = TpuMinHashLSHForest.load(p)
        assert loaded.rank == "jaccard"
        assert loaded.query_batch(ms[:3], 5) == forest.query_batch(ms[:3], 5)

    def test_bad_rank_rejected(self):
        with pytest.raises(ValueError):
            TpuMinHashLSHForest(num_perm=128, rank="nope")
        _, ms = _corpus_minhashes(n=32, seed=15)
        forest = TpuMinHashLSHForest(num_perm=128)
        forest.index(list(range(32)), ms)
        with pytest.raises(ValueError):
            forest.query_batch(ms[:2], 5, rank="nope")


class TestForestCascade:
    """cascade_perm: prefix trees at num_perm, Jaccard rerank at a wider
    signature (the recall trick TpuMinHashLSH ships as cascade_perm)."""

    def test_prefix_walk_identical_to_plain(self):
        """A cascade forest must gather the SAME candidate pool as a
        plain one (prefixes read only the first k*l slots, which are
        prefix-stable in the wide signatures)."""
        sets, ms_wide = _corpus_minhashes(n=96, num_perm=512, seed=21)
        plain = TpuMinHashLSHForest(num_perm=128, rank="jaccard")
        casc = TpuMinHashLSHForest(
            num_perm=128, rank="jaccard", cascade_perm=512
        )
        wide = np.stack([m.hashvalues for m in ms_wide]).astype(np.uint32)
        plain.index(list(range(96)), wide[:, :128])
        casc.index(list(range(96)), wide)
        # both must surface the exact self-match first
        pr = plain.query_batch(wide[:6, :128], 8, return_scores=True)
        cr = casc.query_batch(wide[:6], 8, return_scores=True)
        for qi in range(6):
            assert pr[qi][0][0] == qi and cr[qi][0][0] == qi
            assert cr[qi][0][1] == pytest.approx(1.0)

    def test_cascade_recall_not_worse(self):
        """Scoring over 4x the slots must match or beat plain recall@k
        against the exact ground truth (same candidate walk)."""
        sets, ms_wide = _corpus_minhashes(n=128, num_perm=512, seed=22)
        wide = np.stack([m.hashvalues for m in ms_wide]).astype(np.uint32)
        k, queries = 10, list(range(24))

        def exact_topk(qi):
            js = [
                (len(sets[qi] & sets[j]) / len(sets[qi] | sets[j]), j)
                for j in range(128)
            ]
            js.sort(reverse=True)
            return {j for _, j in js[:k]}

        rec = {}
        for label, cascade, q in (
            ("plain", None, wide[:, :128]),
            ("cascade", 512, wide),
        ):
            f = TpuMinHashLSHForest(
                num_perm=128, rank="jaccard", cascade_perm=cascade
            )
            f.index(list(range(128)), q)
            rows = f.query_batch(q[queries], k)
            rec[label] = sum(
                len(set(row) & exact_topk(qi))
                for qi, row in zip(queries, rows)
            ) / (k * len(queries))
        assert rec["cascade"] >= rec["plain"]

    def test_narrow_input_rejected(self):
        _, ms = _corpus_minhashes(n=8, num_perm=128, seed=23)
        f = TpuMinHashLSHForest(num_perm=128, cascade_perm=256)
        with pytest.raises(ValueError, match="num_perm"):
            f.index(list(range(8)), ms)  # 128-wide rows, needs 256
        with pytest.raises(ValueError, match="cascade_perm"):
            TpuMinHashLSHForest(num_perm=128, cascade_perm=64)

    def test_cascade_survives_save_load(self):
        _, ms = _corpus_minhashes(n=32, num_perm=256, seed=24)
        wide = np.stack([m.hashvalues for m in ms]).astype(np.uint32)
        f = TpuMinHashLSHForest(
            num_perm=128, rank="jaccard", cascade_perm=256
        )
        f.index(list(range(32)), wide)
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "f.npz")
            f.save(p)
            loaded = TpuMinHashLSHForest.load(p)
        assert loaded.cascade_perm == 256
        assert loaded.score_width == 256
        assert loaded.query_batch(wide[:3], 5) == f.query_batch(wide[:3], 5)


class TestForestScanMethod:
    """method='scan'/'auto': route small corpora to the exact fused
    top-k scan (recall 1.0 by construction) instead of the prefix walk
    (measured ceiling ~0.905 on the 16k protocol — VERDICT r4 #3)."""

    def test_scan_is_exact_signature_topk(self):
        _, ms = _corpus_minhashes(n=96, seed=31)
        sigs = np.stack([m.hashvalues for m in ms]).astype(np.uint32)
        forest = TpuMinHashLSHForest(num_perm=128, rank="jaccard")
        forest.index(list(range(96)), sigs)
        k = 8
        rows = forest.query_batch(sigs[:6], k, method="scan",
                                  return_scores=True)
        for qi, row in enumerate(rows):
            # brute-force signature-jaccard top-k over the whole corpus
            est = (sigs[qi][None, :] == sigs).mean(axis=1)
            order = np.argsort(-est, kind="stable")[:k]
            assert [kk for kk, _ in row] == order.tolist()
            assert row[0][0] == qi and row[0][1] == pytest.approx(1.0)

    def test_auto_resolution_rules(self):
        _, ms = _corpus_minhashes(n=64, seed=32)
        forest = TpuMinHashLSHForest(num_perm=128, l=8, cap=64)
        forest.index(list(range(64)), ms)
        # rank='forest' never auto-routes to the scan (prefix ordering
        # is the reference contract)
        assert forest._resolve_method("auto", "forest", 8) == "forest"
        # jaccard rank below the crossover -> scan
        assert forest._resolve_method("auto", "jaccard", 8) == "scan"
        # above the crossover (table bigger than the walk's worst-case
        # gather volume) -> walk; walk_slots = q_pad*l*k_prefix*cap = 8
        tiny = TpuMinHashLSHForest(num_perm=128, l=1, cap=1)
        tiny.k = 1  # force a 1-slot walk model without a giant corpus
        tiny._sigs_dev = np.zeros((128, 128), np.uint32)
        assert tiny._resolve_method("auto", "jaccard", 8) == "forest"
        # explicit method passes through
        assert forest._resolve_method("scan", "forest", 8) == "scan"
        assert forest._resolve_method("forest", "jaccard", 8) == "forest"

    def test_auto_equals_scan_below_crossover(self):
        _, ms = _corpus_minhashes(n=48, seed=33)
        forest = TpuMinHashLSHForest(num_perm=128, rank="jaccard")
        forest.index(list(range(48)), ms)
        auto_rows = forest.query_batch(ms[:5], 6)
        scan_rows = forest.query_batch(ms[:5], 6, method="scan")
        walk_rows = forest.query_batch(ms[:5], 6, method="forest")
        assert auto_rows == scan_rows
        # the walk is still reachable and finds the self key
        for qi, row in enumerate(walk_rows):
            assert qi in row
        # per-call override does not change the index default
        assert forest.method == "auto"

    def test_method_survives_save_load_and_validation(self):
        _, ms = _corpus_minhashes(n=16, seed=34)
        forest = TpuMinHashLSHForest(num_perm=128, rank="jaccard",
                                     method="scan")
        forest.index(list(range(16)), ms)
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "f.npz")
            forest.save(p)
            loaded = TpuMinHashLSHForest.load(p)
        assert loaded.method == "scan"
        assert loaded.query_batch(ms[:3], 5) == forest.query_batch(ms[:3], 5)
        with pytest.raises(ValueError):
            TpuMinHashLSHForest(num_perm=128, method="nope")
        with pytest.raises(ValueError):
            forest.query_batch(ms[:2], 5, method="nope")

    def test_stream_matches_batch_with_scan(self):
        _, ms = _corpus_minhashes(n=32, seed=35)
        sigs = np.stack([m.hashvalues for m in ms]).astype(np.uint32)
        forest = TpuMinHashLSHForest(num_perm=128, rank="jaccard")
        forest.index(list(range(32)), sigs)
        batches = [sigs[:4], sigs[4:8]]
        want = [forest.query_batch(b, 5, method="scan") for b in batches]
        got = list(forest.query_stream(batches, 5, method="scan"))
        assert got == want
