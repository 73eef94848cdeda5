"""Device-side threshold-query finish (lsh_ops.threshold_select).

Threshold queries used to end in a per-query host ``np.unique`` loop;
now dedupe + cutoff filter + compaction run on device and the host only
boolean-indexes one compact buffer. These tests pin the op semantics and
the query_batch behavior of both TpuMinHashLSH and ShardedMinHashLSH.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from datasketch_tpu import MinHash, TpuMinHashLSH
from datasketch_tpu.ops import lsh_ops


def _select(scores, ids, cutoff, max_out):
    si, ss, n = lsh_ops.threshold_select(
        jnp.asarray(scores, jnp.float32),
        jnp.asarray(ids, jnp.int32),
        jnp.float32(cutoff),
        max_out,
    )
    return np.asarray(si), np.asarray(ss), np.asarray(n)


def test_threshold_select_dedupes_and_filters():
    ids = np.array([[3, 7, 3, -1, 9, 7]])
    sc = np.array([[0.9, 0.4, 0.9, 0.0, 0.6, 0.4]])
    si, ss, n = _select(sc, ids, 0.5, 6)
    assert n[0] == 2  # ids 3 (0.9) and 9 (0.6); 7 is below cutoff
    assert list(si[0][:2]) == [3, 9]
    assert ss[0][0] == pytest.approx(0.9)
    assert (si[0][2:] == -1).all()


def test_threshold_select_keep_all_with_negative_cutoff():
    ids = np.array([[5, 5, 2, -1]])
    sc = np.zeros((1, 4), np.float32)
    si, ss, n = _select(sc, ids, -1.0, 4)
    assert n[0] == 2
    # equal scores: stable tie-break after the id-sort -> ascending ids
    assert list(si[0][:2]) == [2, 5]


def test_threshold_select_counts_overflow():
    ids = np.arange(8)[None, :]
    sc = np.linspace(0.9, 0.2, 8, dtype=np.float32)[None, :]
    si, ss, n = _select(sc, ids, 0.0, 3)
    assert n[0] == 8  # distinct matches BEFORE the cap
    assert list(si[0]) == [0, 1, 2]  # highest-scoring three


def test_threshold_select_empty_row():
    ids = np.full((2, 5), -1)
    sc = np.zeros((2, 5), np.float32)
    si, ss, n = _select(sc, ids, 0.5, 5)
    assert (n == 0).all() and (si == -1).all() and (ss == -1.0).all()


def _clustered(n=120, seed=3):
    rng = np.random.RandomState(seed)
    docs = []
    for c in range(n // 4):
        base = rng.choice(30000, 80, replace=False)
        for _ in range(4):
            mutate = rng.rand(80) < 0.15
            d = base.copy()
            d[mutate] = rng.choice(30000, int(mutate.sum()))
            docs.append(d.astype(np.uint32))
    return docs


def _build_pair(max_results=None):
    docs = _clustered()
    sigs = MinHash.bulk_signatures(docs, num_perm=128, hashfunc="device")
    index = TpuMinHashLSH(
        threshold=0.5, num_perm=128, bucket_cap=64, max_results=max_results
    )
    index.index(list(range(len(docs))), sigs)
    mhs = [MinHash(hashvalues=row, hashfunc="device") for row in sigs[:12]]
    return index, mhs


def test_query_batch_device_finish_matches_reference_semantics():
    index, mhs = _build_pair()
    rows = index.query_batch(mhs)
    for i, row in enumerate(rows):
        assert i in row  # self-hit survives the rerank cutoff
        assert len(row) == len(set(row))  # deduped
    scored = index.query_batch(mhs, return_scores=True)
    for i, row in enumerate(scored):
        keys = [k for k, _ in row]
        assert i in keys
        scores = [s for _, s in row]
        assert scores == sorted(scores, reverse=True)  # score-desc order
        assert all(s >= 0.5 - 1e-6 for s in scores)


def test_query_batch_no_rerank_keeps_all_candidates():
    index, mhs = _build_pair()
    index.rerank = False
    rows = index.query_batch(mhs)  # auto falls back to bands w/o rerank
    index.rerank = True
    reranked = index.query_batch(mhs, method="bands")
    for raw, kept in zip(rows, reranked):
        assert set(kept) <= set(raw)  # cutoff only removes candidates
        assert len(raw) == len(set(raw))
    with pytest.raises(ValueError):
        index.rerank = False
        index.query_batch(mhs, method="scan")
    index.rerank = True


def test_query_batch_scan_superset_of_bands():
    """The scan path is exact over stored sketches: it returns every key
    whose estimated Jaccard clears the cutoff, a superset of the band
    candidates that clear it."""
    index, mhs = _build_pair()
    bands = index.query_batch(mhs, return_scores=True, method="bands")
    scan = index.query_batch(mhs, return_scores=True, method="scan")
    for brow, srow in zip(bands, scan):
        assert {k for k, _ in brow} <= {k for k, _ in srow}
        bd, sd = dict(brow), dict(srow)
        for k in bd:
            assert sd[k] == pytest.approx(bd[k])  # same estimator


def test_query_batch_max_results_caps_and_reports():
    full_index, mhs = _build_pair()
    capped_index, _ = _build_pair(max_results=2)
    full = full_index.query_batch(mhs, return_scores=True)
    capped = capped_index.query_batch(mhs, return_scores=True)
    overflow = 0
    for f, c in zip(full, capped):
        assert len(c) <= 2
        # the capped result is the top-scoring prefix of the full result
        assert [k for k, _ in c] == [k for k, _ in f[: len(c)]]
        overflow += max(0, len(f) - 2)
    assert capped_index.last_truncated >= overflow


def test_sharded_query_batch_device_finish():
    import jax
    from datasketch_tpu.parallel.sharded_lsh import ShardedMinHashLSH
    from jax.sharding import Mesh

    docs = _clustered()
    sigs = MinHash.bulk_signatures(docs, num_perm=128, hashfunc="device")
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("data",))
    index = ShardedMinHashLSH(
        mesh, threshold=0.5, num_perm=128, bucket_cap=64
    )
    index.index(list(range(len(docs))), sigs)
    mhs = [MinHash(hashvalues=row, hashfunc="device") for row in sigs[:8]]
    rows = index.query_batch(mhs, return_scores=True, method="bands")
    # the scan method returns the exact threshold answer (superset of the
    # band candidates) and must agree with the single-chip scan
    scan_rows = index.query_batch(mhs, return_scores=True, method="scan")
    for i, row in enumerate(rows):
        keys = [k for k, _ in row]
        assert i in keys
        assert len(keys) == len(set(keys))
        scores = [s for _, s in row]
        assert scores == sorted(scores, reverse=True)
        assert all(s >= 0.5 - 1e-6 for s in scores)
    # single-chip result parity at equal parameters
    single = TpuMinHashLSH(
        threshold=0.5, num_perm=128,
        params=(index.b, index.r), bucket_cap=64,
    )
    single.index(list(range(len(docs))), sigs)
    srows = single.query_batch(mhs, method="bands")
    for sh, si_ in zip(rows, srows):
        assert {k for k, _ in sh} == set(si_)
    s_scan = single.query_batch(mhs, method="scan")
    for sh, si_ in zip(scan_rows, s_scan):
        assert {k for k, _ in sh} == set(si_)


def test_sharded_query_batch_max_results():
    import jax
    from datasketch_tpu.parallel.sharded_lsh import ShardedMinHashLSH
    from jax.sharding import Mesh

    docs = _clustered()
    sigs = MinHash.bulk_signatures(docs, num_perm=128, hashfunc="device")
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2), ("data",))
    index = ShardedMinHashLSH(
        mesh, threshold=0.5, num_perm=128, bucket_cap=64, max_results=3
    )
    index.index(list(range(len(docs))), sigs)
    mhs = [MinHash(hashvalues=row, hashfunc="device") for row in sigs[:4]]
    rows = index.query_batch(mhs)
    # per-shard cap is 3; the merged row can hold up to 3 * n_shards
    assert all(len(r) <= 3 * 2 for r in rows)
    assert all(len(r) == len(set(r)) for r in rows)


def test_query_stream_matches_query_batch():
    index, mhs = _build_pair()
    batches = [mhs[:4], mhs[4:8], mhs[8:12]]
    want = [index.query_batch(b, return_scores=True) for b in batches]
    got = list(index.query_stream(batches, return_scores=True, depth=2))
    assert got == want


def test_unique_compact_op():
    import jax.numpy as jnp

    from datasketch_tpu.ops import lsh_ops

    ids = np.array([[7, 3, 7, -1, 3, 9]], np.int32)
    sel, n = lsh_ops.unique_compact(jnp.asarray(ids), 4)
    sel, n = np.asarray(sel), np.asarray(n)
    assert n[0] == 3
    assert list(sel[0][:3]) == [3, 7, 9]  # ascending, deduped
    assert sel[0][3] == -1
    sel2, n2 = lsh_ops.unique_compact(jnp.asarray(ids), 2)
    assert np.asarray(n2)[0] == 3  # counts BEFORE the cap
    assert list(np.asarray(sel2)[0]) == [3, 7]


def test_no_rerank_no_scores_skips_signature_table(monkeypatch):
    """rerank=False + return_scores=False must never touch the rerank
    (candidates-only, reference semantics): the scoring ops would be
    pure overhead (code-review r3 finding #2)."""
    index, mhs = _build_pair()
    index.rerank = False
    called = {}

    def boom(*a, **k):
        called["rerank"] = True
        raise AssertionError("rerank computed on candidates-only path")

    monkeypatch.setattr(lsh_ops, "rerank_jaccard", boom)
    monkeypatch.setattr(lsh_ops, "query_fused", boom)
    rows = index.query_batch(mhs)
    assert "rerank" not in called
    for i, row in enumerate(rows):
        assert i in row
        assert len(row) == len(set(row))
    index.rerank = True


def test_forest_duplicate_batch_does_not_poison_keys():
    """A mid-batch duplicate key must leave the index unchanged
    (code-review r3 finding #1)."""
    import jax
    from jax.sharding import Mesh

    from datasketch_tpu.models.tpu_forest import TpuMinHashLSHForest
    from datasketch_tpu.parallel import ShardedMinHashLSHForest

    docs = _clustered(16)
    sigs = MinHash.bulk_signatures(docs, num_perm=128, hashfunc="device")
    for make in (
        lambda: TpuMinHashLSHForest(num_perm=128, l=8),
        lambda: ShardedMinHashLSHForest(
            Mesh(np.array(jax.devices()[:2]).reshape(2), ("data",)),
            num_perm=128, l=8,
        ),
    ):
        forest = make()
        forest.index(["a", "b"], sigs[:2])
        with pytest.raises(ValueError):
            forest.index(["c", "b"], sigs[2:4])  # 'b' is a duplicate
        assert "c" not in forest  # rejected batch left no residue
        forest.index(["c"], sigs[2:3])  # and can be retried
        assert "c" in forest


def test_sharded_warmup():
    import jax
    from jax.sharding import Mesh

    from datasketch_tpu.parallel.sharded_lsh import ShardedMinHashLSH

    docs = _clustered(32)
    sigs = MinHash.bulk_signatures(docs, num_perm=128, hashfunc="device")
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2), ("data",))
    index = ShardedMinHashLSH(mesh, threshold=0.5, num_perm=128,
                              bucket_cap=32)
    index.warmup()  # empty index: no-op
    index.index(list(range(32)), sigs)
    index.warmup(batch_sizes=(4,), k=3)
    # compiled fns are cached for the warmed shapes
    assert index._topk_fns or index._topk_scan_fns
    assert index._query_fns or index._query_scan_fns
