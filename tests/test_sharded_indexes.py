"""Sharded forest + ensemble over the virtual CPU mesh.

SURVEY §2.4 maps the reference's storage-backed scale-out onto mesh
sharding; round 2 covered MinHashLSH (parallel/sharded_lsh.py) — these
tests cover the same treatment for the top-k forest
(``/root/reference/datasketch/lshforest.py:92-128``) and the containment
ensemble (``/root/reference/datasketch/lshensemble.py:230-249``):
per-shard probes, k-wide all_gathers, parity with the single-chip
classes, and checkpoint interop across mesh shapes.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from datasketch_tpu import MinHash
from datasketch_tpu.models.tpu_ensemble import TpuMinHashLSHEnsemble
from datasketch_tpu.models.tpu_forest import TpuMinHashLSHForest
from datasketch_tpu.parallel import (
    ShardedMinHashLSHEnsemble,
    ShardedMinHashLSHForest,
)


def _mesh(n):
    return Mesh(np.array(jax.devices()[:n]).reshape(n), ("data",))


def _corpus(n=96, seed=17):
    rng = np.random.RandomState(seed)
    sets = [
        rng.choice(30000, rng.randint(40, 200), replace=False).astype(
            np.uint32
        )
        for _ in range(n)
    ]
    sigs = MinHash.bulk_signatures(sets, num_perm=128, hashfunc="device")
    return sets, sigs


# ----------------------------------------------------------------- forest


def test_sharded_forest_matches_single_chip():
    _, sigs = _corpus()
    single = TpuMinHashLSHForest(num_perm=128, l=8, cap=32)
    single.index(list(range(len(sigs))), sigs)
    sharded = ShardedMinHashLSHForest(_mesh(4), num_perm=128, l=8, cap=32)
    sharded.index(list(range(len(sigs))), sigs)
    queries = sigs[:10]
    want = single.query_batch(queries, k=5)
    got = sharded.query_batch(queries, k=5)
    for i, (w, g) in enumerate(zip(want, got)):
        assert g[0] == i  # self top-1
        # candidate pools may differ at the cap margin; top-1 must agree
        # and overlap must dominate
        assert len(set(w) & set(g)) >= max(1, len(w) - 2), (i, w, g)


def test_sharded_forest_scores_and_incremental():
    _, sigs = _corpus(64)
    sharded = ShardedMinHashLSHForest(_mesh(2), num_perm=128, l=8, cap=32)
    sharded.index(list(range(48)), sigs[:48])
    assert len(sharded) == 48
    sharded.index(list(range(48, 64)), sigs[48:])  # incremental re-shard
    assert len(sharded) == 64 and 63 in sharded
    rows = sharded.query_batch(sigs[60:64], k=3, return_scores=True)
    for i, row in enumerate(rows, start=60):
        assert row[0][0] == i and row[0][1] == pytest.approx(1.0)
        scores = [s for _, s in row]
        assert all(s >= -1e-6 for s in scores)
    with pytest.raises(ValueError):
        sharded.index([0], sigs[:1])  # duplicate key
    with pytest.raises(ValueError):
        sharded.query_batch(sigs[:1, :64], k=3)  # too-short minhash


def test_sharded_forest_save_load_other_mesh(tmp_path):
    _, sigs = _corpus(48)
    sharded = ShardedMinHashLSHForest(_mesh(4), num_perm=128, l=8, cap=32)
    sharded.index(list(range(48)), sigs)
    path = str(tmp_path / "forest.npz")
    sharded.save(path)
    re2 = ShardedMinHashLSHForest.load(path, _mesh(2))
    assert len(re2) == 48 and re2.n_shards == 2
    want = sharded.query_batch(sigs[:6], k=4)
    got = re2.query_batch(sigs[:6], k=4)
    for w, g in zip(want, got):
        assert w[0] == g[0]  # top-1 stable across re-shard


def test_sharded_forest_empty():
    sharded = ShardedMinHashLSHForest(_mesh(2), num_perm=128, l=8)
    assert sharded.is_empty()
    assert sharded.query_batch(np.zeros((2, 128), np.uint32), k=3) == [[], []]


# --------------------------------------------------------------- ensemble


def _ensemble_entries(n=80, seed=23):
    rng = np.random.RandomState(seed)
    sets = [
        rng.choice(30000, rng.randint(20, 400), replace=False).astype(
            np.uint32
        )
        for _ in range(n)
    ]
    sigs = MinHash.bulk_signatures(sets, num_perm=128, hashfunc="device")
    entries = [
        (i, MinHash(hashvalues=row, hashfunc="device"), len(s))
        for i, (row, s) in enumerate(zip(sigs, sets))
    ]
    return sets, sigs, entries


def test_sharded_ensemble_matches_single_chip():
    sets, sigs, entries = _ensemble_entries()
    single = TpuMinHashLSHEnsemble(
        threshold=0.8, num_perm=128, num_part=8, bucket_cap=64
    )
    single.index(entries)
    sharded = ShardedMinHashLSHEnsemble(
        _mesh(4), threshold=0.8, num_perm=128, num_part=8, bucket_cap=64
    )
    sharded.index(entries)
    queries = [
        (MinHash(hashvalues=sigs[i], hashfunc="device"), len(sets[i]))
        for i in range(12)
    ]
    want = single.query_batch(queries)
    got = sharded.query_batch(queries)
    for i, (w, g) in enumerate(zip(want, got)):
        assert set(w) == set(g), (i, sorted(w), sorted(g))
        assert i in g  # self-containment = 1.0 >= threshold


def test_sharded_ensemble_partition_padding():
    # num_part NOT divisible by the shard count: filler partitions must
    # stay invisible
    sets, sigs, entries = _ensemble_entries(40)
    sharded = ShardedMinHashLSHEnsemble(
        _mesh(4), threshold=0.8, num_perm=128, num_part=6, bucket_cap=64
    )
    assert sharded._parts_pad == 8
    sharded.index(entries)
    queries = [
        (MinHash(hashvalues=sigs[i], hashfunc="device"), len(sets[i]))
        for i in range(6)
    ]
    for i, row in enumerate(sharded.query_batch(queries)):
        assert i in row


def test_sharded_ensemble_checkpoint_interop(tmp_path):
    sets, sigs, entries = _ensemble_entries(48)
    single = TpuMinHashLSHEnsemble(
        threshold=0.8, num_perm=128, num_part=8, bucket_cap=64
    )
    single.index(entries)
    path = str(tmp_path / "ens.npz")
    single.save(path)
    # single-chip checkpoint -> sharded mesh
    sharded = ShardedMinHashLSHEnsemble.load(path, _mesh(4))
    queries = [
        (MinHash(hashvalues=sigs[i], hashfunc="device"), len(sets[i]))
        for i in range(8)
    ]
    want = single.query_batch(queries)
    got = sharded.query_batch(queries)
    for w, g in zip(want, got):
        assert set(w) == set(g)
    # sharded checkpoint -> single-chip
    path2 = str(tmp_path / "ens2.npz")
    sharded.save(path2)
    back = TpuMinHashLSHEnsemble.load(path2)
    got2 = back.query_batch(queries)
    for w, g in zip(want, got2):
        assert set(w) == set(g)


def test_sharded_forest_exact_equality_without_truncation():
    """With the gather cap covering every prefix run, forest ranking is a
    per-candidate property ((matched depth, jaccard) of each doc against
    the query), so sharding cannot change the result set: sharded ==
    single-chip EXACTLY, scores included."""
    _, sigs = _corpus(40, seed=29)
    single = TpuMinHashLSHForest(num_perm=128, l=8, cap=64)
    single.index(list(range(len(sigs))), sigs)
    sharded = ShardedMinHashLSHForest(_mesh(4), num_perm=128, l=8, cap=64)
    sharded.index(list(range(len(sigs))), sigs)
    queries = sigs[:8]
    want = single.query_batch(queries, k=6, return_scores=True)
    got = sharded.query_batch(queries, k=6, return_scores=True)
    assert single.last_truncated == 0 and sharded.last_truncated == 0
    for w, g in zip(want, got):
        # identical (key -> jaccard) maps; order can differ only on
        # exact (depth, jaccard) ties
        assert dict(w) == pytest.approx(dict(g))


def test_sharded_forest_query_stream():
    _, sigs = _corpus(32, seed=41)
    sharded = ShardedMinHashLSHForest(_mesh(2), num_perm=128, l=8, cap=32)
    sharded.index(list(range(32)), sigs)
    batches = [sigs[:4], sigs[4:8]]
    want = [sharded.query_batch(b, k=3, return_scores=True)
            for b in batches]
    got = list(sharded.query_stream(batches, k=3, return_scores=True,
                                    depth=2))
    assert got == want


def test_warmup_parity_across_serving_indexes():
    _, sigs = _corpus(24, seed=43)
    single_f = TpuMinHashLSHForest(num_perm=128, l=8, cap=16)
    single_f.warmup()  # empty: no-op
    single_f.index(list(range(24)), sigs)
    single_f.warmup(batch_sizes=(4,), k=3)

    sharded_f = ShardedMinHashLSHForest(_mesh(2), num_perm=128, l=8, cap=16)
    sharded_f.index(list(range(24)), sigs)
    sharded_f.warmup(batch_sizes=(4,), k=3)
    assert sharded_f._query_fns

    _, sigs2, entries = _ensemble_entries(24, seed=44)
    ens = TpuMinHashLSHEnsemble(
        threshold=0.8, num_perm=128, num_part=4, bucket_cap=16
    )
    ens.warmup()  # empty: no-op
    ens.index(entries)
    ens.warmup(batch_sizes=(4,), sizes=(50, 200))


def test_sharded_ensemble_scan_matches_single_chip():
    """method='scan' on the sharded ensemble: per-shard containment
    scans + one all_gather must equal the single-chip scan exactly
    (shard-disjoint id spaces, same estimate, same cutoff)."""
    sets, sigs, entries = _ensemble_entries(64)
    single = TpuMinHashLSHEnsemble(
        threshold=0.8, num_perm=128, num_part=8, bucket_cap=64
    )
    single.index(entries)
    sharded = ShardedMinHashLSHEnsemble(
        _mesh(4), threshold=0.8, num_perm=128, num_part=8, bucket_cap=64
    )
    sharded.index(entries)
    queries = [
        (MinHash(hashvalues=sigs[i], hashfunc="device"), len(sets[i]))
        for i in range(12)
    ]
    want = single.query_batch(queries, method="scan")
    got = sharded.query_batch(queries, method="scan")
    for i, (w, g) in enumerate(zip(want, got)):
        assert set(w) == set(g), (i, sorted(w), sorted(g))
        assert i in g  # self-containment = 1.0
    # auto picks the scan at this size and agrees
    auto = sharded.query_batch(queries, method="auto")
    for g, a in zip(got, auto):
        assert set(g) == set(a)


def test_sharded_ensemble_scan_padding_and_truncation():
    # filler partitions (num_part % shards != 0) carry size 0 and must
    # stay invisible to the scan; per-shard overflow is counted
    sets, sigs, entries = _ensemble_entries(40)
    sharded = ShardedMinHashLSHEnsemble(
        _mesh(4), threshold=0.8, num_perm=128, num_part=6, bucket_cap=64
    )
    sharded.index(entries)
    queries = [
        (MinHash(hashvalues=sigs[i], hashfunc="device"), len(sets[i]))
        for i in range(6)
    ]
    for i, row in enumerate(sharded.query_batch(queries, method="scan")):
        assert i in row
    assert sharded.last_truncated == 0

    # 30 identical sets in one index; max_results=4 per shard forces
    # counted truncation through the collective
    s = np.arange(64, dtype=np.uint32)
    dup_sigs = MinHash.bulk_signatures([s] * 30, num_perm=128,
                                       hashfunc="device")
    dup = ShardedMinHashLSHEnsemble(
        _mesh(2), threshold=0.5, num_perm=128, num_part=2, max_results=4
    )
    dup.index(
        (i, MinHash(hashvalues=row, hashfunc="device"), 64)
        for i, row in enumerate(dup_sigs)
    )
    q = [(MinHash(hashvalues=dup_sigs[0], hashfunc="device"), 64)]
    rows = dup.query_batch(q, method="scan")
    assert len(rows[0]) <= 2 * 4  # <= shards * max_out slots
    assert dup.last_truncated == 30 - len(rows[0])


def test_sharded_ensemble_scan_checkpoint_sizes(tmp_path):
    # sizes survive single-chip -> sharded -> single-chip checkpoints
    sets, sigs, entries = _ensemble_entries(48)
    single = TpuMinHashLSHEnsemble(
        threshold=0.8, num_perm=128, num_part=8, bucket_cap=64
    )
    single.index(entries)
    path = str(tmp_path / "ens.npz")
    single.save(path)
    sharded = ShardedMinHashLSHEnsemble.load(path, _mesh(4))
    assert sharded._sizes_sharded is not None
    queries = [
        (MinHash(hashvalues=sigs[i], hashfunc="device"), len(sets[i]))
        for i in range(8)
    ]
    want = single.query_batch(queries, method="scan")
    got = sharded.query_batch(queries, method="scan")
    for w, g in zip(want, got):
        assert set(w) == set(g)
    path2 = str(tmp_path / "ens2.npz")
    sharded.save(path2)
    back = TpuMinHashLSHEnsemble.load(path2)
    got2 = back.query_batch(queries, method="scan")
    for w, g in zip(want, got2):
        assert set(w) == set(g)


def test_sharded_forest_jaccard_rank():
    """rank='jaccard' on the sharded forest: scores descend, self first,
    and the per-call override matches the single-chip ordering."""
    _, sigs = _corpus(n=80, seed=23)
    single = TpuMinHashLSHForest(num_perm=128, l=8, cap=32, rank="jaccard")
    single.index(list(range(len(sigs))), sigs)
    sharded = ShardedMinHashLSHForest(
        _mesh(4), num_perm=128, l=8, cap=32, rank="jaccard"
    )
    sharded.index(list(range(len(sigs))), sigs)
    queries = sigs[:8]
    got = sharded.query_batch(queries, k=5, return_scores=True)
    want = single.query_batch(queries, k=5, return_scores=True)
    for qi, (g, w) in enumerate(zip(got, want)):
        scores = [s for _, s in g]
        assert scores == sorted(scores, reverse=True)
        assert g[0][0] == qi
        # same pool, same ordering: sharded results mirror single-chip
        # (cap-margin rows may differ when runs straddle shards)
        overlap = len({k for k, _ in g} & {k for k, _ in w})
        assert overlap >= max(1, min(len(g), len(w)) - 1)


def test_sharded_forest_cascade():
    """cascade_perm on the sharded forest: same prefix walk as the plain
    sharded forest, Jaccard scored over the wide rows, self-match first,
    and the checkpoint round-trips the cascade onto another mesh."""
    rng = np.random.RandomState(31)
    sets = [
        rng.choice(30000, rng.randint(40, 200), replace=False).astype(
            np.uint32
        )
        for _ in range(80)
    ]
    wide = MinHash.bulk_signatures(
        sets, num_perm=512, hashfunc="device"
    )
    single = TpuMinHashLSHForest(
        num_perm=128, l=8, cap=32, rank="jaccard", cascade_perm=512
    )
    single.index(list(range(len(wide))), wide)
    sharded = ShardedMinHashLSHForest(
        _mesh(4), num_perm=128, l=8, cap=32, rank="jaccard",
        cascade_perm=512,
    )
    sharded.index(list(range(len(wide))), wide)
    got = sharded.query_batch(wide[:8], k=5, return_scores=True)
    want = single.query_batch(wide[:8], k=5, return_scores=True)
    for qi, (g, w) in enumerate(zip(got, want)):
        assert g[0][0] == qi and g[0][1] == pytest.approx(1.0)
        overlap = len({k for k, _ in g} & {k for k, _ in w})
        assert overlap >= max(1, min(len(g), len(w)) - 1)
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "f.npz")
        sharded.save(p)
        re2 = ShardedMinHashLSHForest.load(p, _mesh(2))
    assert re2.cascade_perm == 512 and re2.score_width == 512
    assert re2.query_batch(wide[:4], k=5) == sharded.query_batch(
        wide[:4], k=5
    )


def test_sharded_ensemble_scan_escalation():
    """A query whose true match count exceeds the fused-kernel fast-path
    k (128 per shard) must trigger the full-budget rerun: every match
    returned, none silently dropped."""
    doc = np.arange(60, dtype=np.uint32)
    docs = [doc] * 300 + [
        np.arange(1000 + 50 * i, 1000 + 50 * i + 40, dtype=np.uint32)
        for i in range(100)
    ]
    sigs = MinHash.bulk_signatures(docs, num_perm=128, hashfunc="device")
    entries = [(i, sigs[i], len(docs[i])) for i in range(len(docs))]
    sharded = ShardedMinHashLSHEnsemble(
        _mesh(2), threshold=0.8, num_perm=128, num_part=4, bucket_cap=64
    )
    sharded.index(entries)
    q = [(MinHash(hashvalues=sigs[0], hashfunc="device"), len(doc))]
    got = sharded.query_batch(q, method="scan")[0]
    assert set(range(300)).issubset(set(got)), len(got)
    # single-chip twin agrees
    single = TpuMinHashLSHEnsemble(
        threshold=0.8, num_perm=128, num_part=4, bucket_cap=64
    )
    single.index(entries)
    want = single.query_batch(q, method="scan")[0]
    assert set(want) == set(got)


def test_sharded_ensemble_query_stream():
    sets, sigs, entries = _ensemble_entries()
    sharded = ShardedMinHashLSHEnsemble(
        _mesh(4), threshold=0.8, num_perm=128, num_part=8, bucket_cap=64
    )
    sharded.index(entries)
    queries = [
        (MinHash(hashvalues=sigs[i], hashfunc="device"), len(sets[i]))
        for i in range(16)
    ]
    batches = [queries[:8], queries[8:]]
    want = [sharded.query_batch(b, method="scan") for b in batches]
    got = list(sharded.query_stream(batches, depth=2))
    for w_rows, g_rows, base in zip(want, got, (0, 8)):
        for i, (w, g) in enumerate(zip(w_rows, g_rows)):
            assert set(w) == set(g)
            assert base + i in g  # self-containment


def test_sharded_forest_scan_method_matches_single_chip():
    """method='scan' (and 'auto' below the crossover): per-shard exact
    topk_scan + k-wide all_gather reproduces the single-chip scan route
    EXACTLY (both are exact over stored sketches), and the method knob
    survives a cross-mesh checkpoint."""
    import tempfile, os

    _, sigs = _corpus(n=80, seed=41)
    single = TpuMinHashLSHForest(num_perm=128, l=8, cap=32, rank="jaccard")
    single.index(list(range(len(sigs))), sigs)
    sharded = ShardedMinHashLSHForest(
        _mesh(4), num_perm=128, l=8, cap=32, rank="jaccard"
    )
    sharded.index(list(range(len(sigs))), sigs)
    # default 'auto' resolves to scan at this size for BOTH — exact match
    assert sharded._resolve_method("auto", "jaccard", 8) == "scan"
    got = sharded.query_batch(sigs[:8], k=5, return_scores=True)
    want = single.query_batch(sigs[:8], k=5, method="scan",
                              return_scores=True)
    assert [[k for k, _ in row] for row in got] == [
        [k for k, _ in row] for row in want
    ]
    for g, w in zip(got, want):
        for (_, gs), (_, ws) in zip(g, w):
            assert gs == pytest.approx(ws)
    # rank='forest' never auto-routes to the scan; explicit passthrough
    assert sharded._resolve_method("auto", "forest", 8) == "forest"
    assert sharded._resolve_method("forest", "jaccard", 8) == "forest"
    # the walk route stays reachable per call and still self-recalls
    walk = sharded.query_batch(sigs[:4], k=5, method="forest")
    for qi, row in enumerate(walk):
        assert qi in row
    # method persists across a checkpoint onto another mesh shape
    sharded.method = "scan"
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "f.npz")
        sharded.save(p)
        loaded = ShardedMinHashLSHForest.load(p, _mesh(2))
    assert loaded.method == "scan"
    assert loaded.query_batch(sigs[:4], k=5) == sharded.query_batch(
        sigs[:4], k=5
    )
