"""Regressions from the round-2 self-review (code-review findings).

Each test pins one confirmed defect: buffered-merge corruption, tombstone
resurrection, tuple-key persistence, dropped constructor params, width
mismatches at num_perm % l != 0, and device-targeted health probes.
"""

import numpy as np
import jax
import pytest

from datasketch_tpu import (
    HNSW,
    MinHash,
    TpuHNSW,
    TpuMinHashLSH,
    TpuMinHashLSHForest,
)
from datasketch_tpu.parallel import ShardedMinHashLSH, make_mesh


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8
    return make_mesh(8)


def _minhashes(n, num_perm=128, seed=0):
    rng = np.random.RandomState(seed)
    sigs = rng.randint(0, 1 << 32, size=(n, num_perm), dtype=np.uint64)
    return [MinHash(num_perm=num_perm, hashvalues=row) for row in sigs], sigs


def test_sharded_merge_flushes_pending_tpu_lsh(mesh):
    """merge(other) with a TpuMinHashLSH holding buffered inserts must
    flush them first — otherwise keys register without signature rows."""
    mhs, _ = _minhashes(24, seed=3)
    sharded = ShardedMinHashLSH(mesh, threshold=0.5, num_perm=128)
    sharded.index([f"s{i}" for i in range(20)], mhs[:20])
    other = TpuMinHashLSH(threshold=0.5, num_perm=128)
    other.index([f"o{i}" for i in range(3)], mhs[20:23])
    other.insert("pending0", mhs[23])  # buffered; no query flushed it
    sharded.merge(other)
    assert "pending0" in sharded
    # its signature row must actually be searchable
    res = sharded.query_batch([mhs[23]])
    assert "pending0" in res[0]
    # and removable without walking off the alive array
    sharded.remove("pending0")
    assert "pending0" not in sharded


def _small_hnsw(n=24, dim=8, seed=0):
    rng = np.random.RandomState(seed)
    pts = rng.random_sample((n, dim)).astype(np.float32)
    host = HNSW(distance_func=lambda a, b: float(np.linalg.norm(a - b)))
    for i in range(n):
        host.insert(i, pts[i])
    return host, pts


def test_tpu_hnsw_from_hnsw_excludes_tombstones():
    host, pts = _small_hnsw()
    host.remove(3)  # soft delete
    ix = TpuHNSW.from_hnsw(host, distance_metric="l2")
    assert 3 not in ix
    assert len(ix) == len(pts) - 1
    hits = ix.query(pts[3], k=5)
    assert all(k != 3 for k, _ in hits)


def test_tpu_hnsw_rebuild_does_not_resurrect_tombstones():
    host, pts = _small_hnsw()
    host.remove(3)
    ix = TpuHNSW.from_hnsw(host, distance_metric="l2")
    rng = np.random.RandomState(9)
    ix.index([100, 101], rng.random_sample((2, pts.shape[1])).astype(np.float32))
    assert 3 not in ix
    hits = ix.query(pts[3], k=5)
    assert all(k != 3 for k, _ in hits)


def test_tpu_forest_tuple_keys_save_load(tmp_path):
    mhs, _ = _minhashes(12, seed=1)
    keys = [("part", i) for i in range(12)]
    f = TpuMinHashLSHForest(num_perm=128, l=8)
    f.index(keys, mhs)
    path = str(tmp_path / "forest.npz")
    f.save(path)
    back = TpuMinHashLSHForest.load(path)
    assert ("part", 3) in back
    assert back.query(mhs[3], 3)[0] == ("part", 3)


def test_tpu_hnsw_tuple_keys_save_load(tmp_path):
    rng = np.random.RandomState(2)
    pts = rng.random_sample((16, 8)).astype(np.float32)
    ix = TpuHNSW(distance_metric="l2")
    ix.index([("k", i) for i in range(16)], pts)
    path = str(tmp_path / "hnsw.npz")
    ix.save(path)
    back = TpuHNSW.load(path)
    assert ("k", 5) in back
    assert back.query(pts[5], k=1)[0][0] == ("k", 5)


def test_sharded_tuple_keys_save_load(tmp_path, mesh):
    mhs, _ = _minhashes(20, seed=4)
    sh = ShardedMinHashLSH(mesh, threshold=0.5, num_perm=128)
    sh.index([("doc", i) for i in range(20)], mhs)
    path = str(tmp_path / "sharded.npz")
    sh.save(path)
    back = ShardedMinHashLSH.load(path, mesh)
    assert ("doc", 7) in back
    assert ("doc", 7) in back.query_batch([mhs[7]])[0]


def test_tpu_ensemble_tuple_keys_and_weights_save_load(tmp_path):
    from datasketch_tpu.models.tpu_ensemble import TpuMinHashLSHEnsemble

    rng = np.random.RandomState(5)
    entries = []
    for i in range(12):
        size = int(rng.randint(20, 200))
        m = MinHash(num_perm=128)
        m.update_batch([bytes([j % 251, i]) for j in range(size)])
        entries.append((("e", i), m, size))
    ens = TpuMinHashLSHEnsemble(
        threshold=0.6, num_perm=128, num_part=4, weights=(0.2, 0.8)
    )
    ens.index(entries)
    path = str(tmp_path / "ens.npz")
    ens.save(path)
    back = TpuMinHashLSHEnsemble.load(path)
    # weights shape the (b, r) tables; a silent default would re-tune queries
    assert back.weights == (0.2, 0.8)
    assert back.rs == ens.rs
    np.testing.assert_array_equal(
        np.asarray(back.params, dtype=object).tolist(),
        np.asarray(ens.params, dtype=object).tolist(),
    )
    assert ("e", 3) in back
    hits = list(back.query(entries[3][1], entries[3][2]))
    assert ("e", 3) in hits


def test_tpu_forest_non_divisible_num_perm():
    """num_perm=100, l=8 -> k*l = 96: reference-valid 96-wide minhashes
    must index and query (the effective width is k*l, not num_perm)."""
    num_perm, l = 100, 8
    f = TpuMinHashLSHForest(num_perm=num_perm, l=l)
    width = f.k * f.l
    assert width == 96
    mhs, _ = _minhashes(10, num_perm=width, seed=6)
    f.add("a0", mhs[0])
    f.index([f"b{i}" for i in range(1, 10)], mhs[1:])
    assert f.query(mhs[0], 3)[0] == "a0"
    # full-length minhashes keep working too (sliced to width)
    full, _ = _minhashes(1, num_perm=num_perm, seed=7)
    f.index(["full0"], full)
    assert f.query(full[0], 3)[0] == "full0"


def test_tpu_forest_save_flushes_pending(tmp_path):
    mhs, _ = _minhashes(6, seed=8)
    f = TpuMinHashLSHForest(num_perm=128, l=8)
    f.index([f"d{i}" for i in range(5)], mhs[:5])
    f.add("staged", mhs[5])  # staged but never index()ed
    path = str(tmp_path / "forest2.npz")
    f.save(path)
    back = TpuMinHashLSHForest.load(path)
    assert "staged" in back
    assert back.query(mhs[5], 3)[0] == "staged"


def test_healthcheck_subprocess_targets_device():
    """The isolate=True probe must honor device=: it probes by device id
    in the child process (and reports a bogus id instead of silently
    probing the default device)."""
    from datasketch_tpu.utils import device_healthcheck

    res = device_healthcheck(timeout=120.0, device=jax.devices()[1])
    assert res["ok"], res

    class FakeDevice:
        id = 10**6

    res = device_healthcheck(timeout=120.0, device=FakeDevice())
    assert not res["ok"] and "no device with id" in res["error"]
