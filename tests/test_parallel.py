"""Multi-device sharding tests on the virtual 8-device CPU mesh.

The fake-backend analogue of the reference's mocked-Redis tests
(``/root/reference/test/test_lsh.py:159-230``), per SURVEY.md §4.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from datasketch_tpu import MinHash
from datasketch_tpu.ops import minhash_ops
from datasketch_tpu.parallel import (
    ShardedMinHashLSH,
    distributed_hll_union,
    distributed_minhash_union,
    make_mesh,
    sharded_compute_signatures,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8
    return make_mesh(8)


def _batch(batch=32, tokens=64, seed=0):
    rng = np.random.RandomState(seed)
    hashes = rng.randint(0, 1 << 32, size=(batch, tokens), dtype=np.uint64).astype(
        np.uint32
    )
    lengths = rng.randint(1, tokens + 1, size=(batch,)).astype(np.int32)
    return hashes, lengths


def test_sharded_signatures_match_single_device(mesh):
    hashes, lengths = _batch()
    sharded = sharded_compute_signatures(hashes, lengths, seed=1, num_perm=128, mesh=mesh)
    single = minhash_ops.compute_signatures(hashes, lengths, 1, 128)
    np.testing.assert_array_equal(np.asarray(sharded), np.asarray(single))


def test_distributed_minhash_union_matches_elementwise_min(mesh):
    hashes, lengths = _batch(seed=3)
    sigs = sharded_compute_signatures(hashes, lengths, seed=1, num_perm=128, mesh=mesh)
    union = distributed_minhash_union(sigs, mesh)
    np.testing.assert_array_equal(np.asarray(union), np.asarray(sigs).min(axis=0))


def test_distributed_hll_union_matches_register_max(mesh):
    rng = np.random.RandomState(7)
    regs = rng.randint(0, 30, size=(32, 256)).astype(np.int8)
    merged = distributed_hll_union(jnp.asarray(regs), mesh)
    np.testing.assert_array_equal(np.asarray(merged), regs.max(axis=0))


def test_sharded_lsh_self_recall_and_parity(mesh):
    rng = np.random.RandomState(11)
    n, num_perm = 50, 128  # deliberately NOT divisible by the shard count
    base = rng.randint(0, 1 << 32, size=(num_perm,), dtype=np.uint64)
    sigs = []
    for i in range(n):
        hv = base.copy()
        flip = rng.rand(num_perm) < (i % 10) / 10.0
        hv[flip] = rng.randint(0, 1 << 32, size=int(flip.sum()), dtype=np.uint64)
        sigs.append(hv.astype(np.uint32))
    keys = ["k%d" % i for i in range(n)]
    mhs = [MinHash(num_perm=num_perm, hashvalues=s) for s in sigs]

    index = ShardedMinHashLSH(mesh, threshold=0.5, num_perm=num_perm, bucket_cap=64)
    index.index(keys, mhs)
    assert len(index) == n and "k0" in index and not index.is_empty()

    results = index.query_batch(mhs[:8])
    for i, res in enumerate(results):
        assert keys[i] in res  # self-recall
        # threshold semantics: every returned key really estimates >= 0.5
        for k in res:
            j = int(k[1:])
            est = float(np.mean(sigs[i] == sigs[j]))
            assert est >= 0.5

    with pytest.raises(ValueError):
        index.index(["k0"], [mhs[0]])  # duplicate key


def test_sharded_lsh_index_tokens(mesh):
    """Pre-tokenized device-hash build on the mesh: signatures stay
    device-resident (out='device') and queries built with
    hashfunc='device' at the same seed hit their own doc."""
    rng = np.random.RandomState(9)
    docs = [rng.randint(0, 1 << 31, 60).astype(np.uint32) for _ in range(24)]
    index = ShardedMinHashLSH(mesh, threshold=0.5, num_perm=128,
                              bucket_cap=32)
    index.index_tokens(["t%d" % i for i in range(24)], docs)
    queries = []
    for d in docs[:3]:
        m = MinHash(num_perm=128, hashfunc="device")
        m.update_batch([int(x) for x in d])
        queries.append(m)
    for i, res in enumerate(index.query_batch(queries)):
        assert "t%d" % i in res


def test_sharded_lsh_incremental_reindex(mesh):
    rng = np.random.RandomState(5)
    num_perm = 128
    sigs = rng.randint(0, 1 << 32, size=(20, num_perm), dtype=np.uint64)
    mhs = [MinHash(num_perm=num_perm, hashvalues=s) for s in sigs]
    index = ShardedMinHashLSH(mesh, threshold=0.8, num_perm=num_perm)
    index.index(["a%d" % i for i in range(10)], mhs[:10])
    index.index(["b%d" % i for i in range(10)], mhs[10:])
    assert len(index) == 20
    res = index.query(mhs[15])
    assert "b5" in res


def test_sharded_lsh_top_k(mesh):
    rng = np.random.RandomState(9)
    num_perm = 128
    base = rng.randint(0, 1 << 32, size=(num_perm,), dtype=np.uint64)
    sigs = []
    for i in range(24):
        hv = base.copy()
        flip = rng.rand(num_perm) < (i % 6) / 10.0
        hv[flip] = rng.randint(0, 1 << 32, size=int(flip.sum()), dtype=np.uint64)
        sigs.append(hv.astype(np.uint32))
    mhs = [MinHash(num_perm=num_perm, hashvalues=s) for s in sigs]
    index = ShardedMinHashLSH(mesh, threshold=0.3, num_perm=num_perm,
                              bucket_cap=64)
    index.index(["k%d" % i for i in range(24)], mhs)
    top = index.top_k([mhs[0]], k=5)[0]
    assert top[0][0] == "k0" and abs(top[0][1] - 1.0) < 1e-6
    scores = [s for _, s in top]
    assert scores == sorted(scores, reverse=True) and len(top) <= 5


def _corpus_sigs(n=40, num_perm=128, seed=21):
    docs = [
        [("d%d-%d" % (i, t)).encode() for t in range(25)] for i in range(n)
    ]
    return MinHash.bulk_signatures(docs, num_perm=num_perm)


def test_sharded_lsh_remove_and_compact(mesh):
    from datasketch_tpu import TpuMinHashLSH

    sigs = _corpus_sigs()
    keys = ["k%d" % i for i in range(40)]
    sh = ShardedMinHashLSH(mesh, threshold=0.5, num_perm=128, bucket_cap=32)
    sh.index(keys, sigs)
    q = [MinHash(num_perm=128, hashvalues=sigs[i]) for i in range(6)]
    assert sh.query(q[3])[0] == "k3"
    sh.remove("k3")
    assert "k3" not in sh and len(sh) == 39
    assert "k3" not in sh.query(q[3])
    with pytest.raises(ValueError):
        sh.remove("k3")
    # other keys unaffected
    assert sh.query(q[4]) == ["k4"]
    sh.compact()
    assert len(sh) == 39 and "k3" not in sh
    assert sh.query(q[4]) == ["k4"]
    # parity with the single-device index after the same removals
    single = TpuMinHashLSH(threshold=0.5, num_perm=128, bucket_cap=32)
    single.index(keys, sigs)
    single.remove("k3")
    for i in range(6):
        assert sorted(sh.query(q[i])) == sorted(single.query(q[i])), i


def test_sharded_lsh_save_load_reshard(tmp_path, mesh):
    sigs = _corpus_sigs(seed=5)
    keys = ["k%d" % i for i in range(40)]
    sh = ShardedMinHashLSH(mesh, threshold=0.5, num_perm=128, bucket_cap=32)
    sh.index(keys, sigs)
    sh.remove("k7")
    path = str(tmp_path / "sharded.npz")
    sh.save(path)
    # load onto a DIFFERENT shard count (2x4 mesh -> data axis 2)
    mesh2 = make_mesh(8, shape=(2, 4))
    loaded = ShardedMinHashLSH.load(path, mesh2)
    assert loaded.n_shards == 2 and len(loaded) == 39
    q = [MinHash(num_perm=128, hashvalues=sigs[i]) for i in range(8)]
    for i in range(8):
        assert sorted(loaded.query(q[i])) == sorted(sh.query(q[i])), i
    assert "k7" not in loaded


def test_sharded_lsh_incremental_is_device_side(mesh):
    """Incremental index() must extend on device and preserve results."""
    sigs = _corpus_sigs(seed=13)
    keys = ["k%d" % i for i in range(40)]
    sh = ShardedMinHashLSH(mesh, threshold=0.5, num_perm=128)
    sh.index(keys[:25], sigs[:25])
    sh.index(keys[25:], sigs[25:])
    whole = ShardedMinHashLSH(mesh, threshold=0.5, num_perm=128)
    whole.index(keys, sigs)
    q = [MinHash(num_perm=128, hashvalues=sigs[i]) for i in range(0, 40, 7)]
    assert [sorted(r) for r in sh.query_batch(q)] == [
        sorted(r) for r in whole.query_batch(q)
    ]


def test_sharded_lsh_topk_parity_with_single_device(mesh):
    from datasketch_tpu import TpuMinHashLSH

    rng = np.random.RandomState(31)
    num_perm = 128
    base = rng.randint(0, 1 << 32, size=(num_perm,), dtype=np.uint64)
    sigs = []
    for i in range(32):
        hv = base.copy()
        flip = rng.rand(num_perm) < (i % 8) / 12.0
        hv[flip] = rng.randint(0, 1 << 32, size=int(flip.sum()), dtype=np.uint64)
        sigs.append(hv.astype(np.uint32))
    sigs = np.stack(sigs)
    keys = ["k%d" % i for i in range(32)]
    sh = ShardedMinHashLSH(mesh, threshold=0.3, num_perm=num_perm, bucket_cap=64)
    sh.index(keys, sigs)
    single = TpuMinHashLSH(threshold=0.3, num_perm=num_perm, bucket_cap=64)
    single.index(keys, sigs)
    qs = [MinHash(num_perm=num_perm, hashvalues=sigs[i]) for i in range(4)]
    got = sh.top_k(qs, k=5)
    want = single.top_k(qs, k=5)
    for g, w in zip(got, want):
        assert {k for k, _ in g} == {k for k, _ in w}
        np.testing.assert_allclose(
            [s for _, s in g], [s for _, s in w], atol=1e-6
        )
    # tombstones respected by the fused top-k path
    sh.remove("k0")
    got = sh.top_k([qs[0]], k=5)[0]
    assert all(k != "k0" for k, _ in got)


def test_sharded_lsh_merge_and_status(mesh):
    sigs = _corpus_sigs(seed=17)
    a = ShardedMinHashLSH(mesh, threshold=0.5, num_perm=128)
    a.index(["k%d" % i for i in range(20)], sigs[:20])
    b = ShardedMinHashLSH(mesh, threshold=0.5, num_perm=128)
    b.index(["k%d" % i for i in range(20, 40)], sigs[20:])
    b.remove("k39")
    a.merge(b)
    assert len(a) == 39 and "k39" not in a
    q = [MinHash(num_perm=128, hashvalues=sigs[i]) for i in (3, 25, 39)]
    assert a.query(q[0]) == ["k3"]
    assert a.query(q[1]) == ["k25"]
    assert a.query(q[2]) == []  # tombstone carried through the merge
    with pytest.raises(ValueError):
        a.merge(ShardedMinHashLSH(mesh, threshold=0.5, num_perm=64))
    st = a.status()
    assert st["n_shards"] == mesh.shape["data"]
    assert st["n_live"] == 39 and st["n_tombstoned"] == 1
    assert st["rows_per_shard"] * st["n_shards"] == 39 + 1 + st["n_padded"]
    assert st["device_bytes"] > 0 and st["max_bucket"] >= 1


def test_sharded_top_k_stream_matches_sync():
    import numpy as np

    from datasketch_tpu import MinHash
    from datasketch_tpu.parallel import ShardedMinHashLSH, make_mesh

    mesh = make_mesh(8)
    rng = np.random.RandomState(11)
    sigs = rng.randint(0, 1 << 32, size=(96, 128), dtype=np.uint64).astype(np.uint32)
    mhs = [MinHash(num_perm=128, hashvalues=r) for r in sigs]
    ix = ShardedMinHashLSH(mesh, threshold=0.5, num_perm=128, bucket_cap=16)
    ix.index([f"d{i}" for i in range(96)], mhs)
    qs = mhs[:6]
    sync = ix.top_k(qs, k=4)
    out = list(ix.top_k_stream([qs, qs], k=4, depth=3))
    assert out == [sync, sync]


def test_sharded_top_k_scan_matches_bands_and_bruteforce():
    import numpy as np

    from datasketch_tpu import MinHash
    from datasketch_tpu.parallel import ShardedMinHashLSH, make_mesh

    mesh = make_mesh(8)
    rng = np.random.RandomState(21)
    sigs = rng.randint(0, 1 << 32, size=(200, 128), dtype=np.uint64).astype(np.uint32)
    # plant near-duplicates so scores are non-trivial
    sigs[150:] = np.where(rng.rand(50, 128) < 0.8, sigs[:50], sigs[150:])
    mhs = [MinHash(num_perm=128, hashvalues=r) for r in sigs]
    ix = ShardedMinHashLSH(mesh, threshold=0.5, num_perm=128, bucket_cap=16)
    ix.index([f"d{i}" for i in range(200)], mhs)
    qs = mhs[:6]

    scan = ix.top_k(qs, k=5, method="scan")
    assert ix.last_truncated == 0
    H = sigs.astype(np.int64)
    for i in range(6):
        assert scan[i][0][0] == f"d{i}" and abs(scan[i][0][1] - 1.0) < 1e-6
        jac = (H == H[i]).mean(axis=1)
        want = sorted(np.round(np.sort(jac)[::-1][:5], 6))
        got = sorted(round(s, 6) for _, s in scan[i])
        assert want == got, (i, want, got)

    bands = ix.top_k(qs, k=5, method="bands")
    assert all(bands[i][0][0] == f"d{i}" for i in range(6))
    auto = ix.top_k(qs, k=5)  # small corpus -> auto picks scan
    assert auto == scan

    # tombstones respected by the scan path
    ix.remove("d0")
    after = ix.top_k([mhs[0]], k=5, method="scan")[0]
    assert all(key != "d0" for key, _ in after)
