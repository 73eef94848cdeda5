"""ShardedBBitIndex over the virtual CPU mesh.

Corpus-sharded b-bit exact scan (reference estimator semantics:
``/root/reference/datasketch/b_bit_minhash.py:53-72``). The sharded
scan is a lossless partition of the single-chip scan — per-shard top-k
pools gathered then re-top-k'd, with the tie order composing back to
global-id order — so results must be EXACTLY equal to the single-chip
:class:`TpuBBitIndex`, not statistically close.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from datasketch_tpu import TpuBBitIndex
from datasketch_tpu.parallel import ShardedBBitIndex


def _mesh(n):
    return Mesh(np.array(jax.devices()[:n]).reshape(n), ("data",))


def _rand_sigs(rng, n, p=128):
    return rng.randint(0, 1 << 32, size=(n, p), dtype=np.uint64).astype(
        np.uint32
    )


@pytest.mark.parametrize("b", [1, 4])
@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_sharded_bbit_exact_parity(b, n_shards):
    rng = np.random.RandomState(7)
    db = _rand_sigs(rng, 200)
    q = _rand_sigs(rng, 13)
    q[0] = db[42]
    single = TpuBBitIndex(b=b, num_perm=128)
    sharded = ShardedBBitIndex(_mesh(n_shards), b=b, num_perm=128)
    keys = [f"d{i}" for i in range(len(db))]
    single.insert_batch(keys, db)
    sharded.insert_batch(keys, db)
    for k in (1, 5, 16):
        assert sharded.query_batch(q, k) == single.query_batch(q, k)
    got = sharded.query_batch(q, 5, return_scores=True)
    want = single.query_batch(q, 5, return_scores=True)
    for g_row, w_row in zip(got, want):
        assert [key for key, _ in g_row] == [key for key, _ in w_row]
        np.testing.assert_allclose(
            [s for _, s in g_row], [s for _, s in w_row], atol=1e-12
        )


def test_sharded_bbit_remove_and_incremental():
    rng = np.random.RandomState(1)
    db = _rand_sigs(rng, 60)
    mesh = _mesh(4)
    idx = ShardedBBitIndex(mesh, b=4, num_perm=128)
    idx.insert_batch(list(range(40)), db[:40])
    assert idx.query(db[7], 1) == [7]
    idx.remove(7)
    assert idx.query(db[7], 1) != [7]
    # incremental insert re-shards; removed key stays removed
    idx.insert_batch(list(range(40, 60)), db[40:])
    assert idx.query(db[50], 1) == [50]
    assert idx.query(db[7], 1) != [7]
    assert len(idx) == 59
    st = idx.status()
    assert st["n_shards"] == 4 and st["n_removed"] == 1
    idx.compact()
    assert idx.query(db[50], 1) == [50]


def test_sharded_bbit_save_load_reshard(tmp_path):
    rng = np.random.RandomState(5)
    db = _rand_sigs(rng, 90)
    q = _rand_sigs(rng, 6)
    sharded = ShardedBBitIndex(_mesh(4), b=2, num_perm=128)
    sharded.insert_batch(list(range(90)), db)
    path = str(tmp_path / "bbit_sharded")
    sharded.save(path)
    # checkpoint loads onto a DIFFERENT mesh shape...
    re2 = ShardedBBitIndex.load(path, _mesh(2))
    assert re2.query_batch(q, 5) == sharded.query_batch(q, 5)
    # ...and interoperates with the single-chip class in both directions
    single = TpuBBitIndex.load(path)
    assert single.query_batch(q, 5) == sharded.query_batch(q, 5)
    single.save(str(tmp_path / "bbit_single"))
    re8 = ShardedBBitIndex.load(str(tmp_path / "bbit_single"), _mesh(8))
    assert re8.query_batch(q, 5) == sharded.query_batch(q, 5)


def test_sharded_bbit_empty_and_stream():
    mesh = _mesh(4)
    idx = ShardedBBitIndex(mesh, b=4, num_perm=64)
    assert idx.query_batch([np.zeros(64, dtype=np.uint32)], 3) == [[]]
    rng = np.random.RandomState(2)
    db = _rand_sigs(rng, 50, p=64)
    idx.insert_batch(list(range(50)), db)
    batches = [_rand_sigs(rng, 8, p=64) for _ in range(3)]
    want = [idx.query_batch(bt, 4) for bt in batches]
    got = list(idx.query_stream(iter(batches), 4))
    assert got == want
