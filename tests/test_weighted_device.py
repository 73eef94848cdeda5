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
